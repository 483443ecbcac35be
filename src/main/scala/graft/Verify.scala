package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. Extra args
  * beyond `<sfDir> <outDir>` select a query subset (dev iteration). */
object Verify {
  def main(args: Array[String]): Unit = {
    val (Array(sfDir, outDir), subset) = args.splitAt(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // the tuned production session (AQE, extensions, and — load-bearing
    // here — a per-process warehouse dir: a raw builder defaults to
    // ./spark-warehouse, where a PREVIOUS JVM's managed-table leftovers
    // collide with this run's store writes as LOCATION_ALREADY_EXISTS)
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // a typo'd name must fail loudly — silently selecting nothing would
    // leave stale parquet from a prior run in outDir and precheck green
    val unknown = subset.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.mkString(", ")}")
    val selected =
      if (subset.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(subset.contains).toMap
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // manifest of what THIS run actually wrote: a reused outDir may hold
    // stale parquet for unselected queries from a prior run — precheck
    // restricts itself to the manifest so stale dumps can't show green
    // for code that changed since the last full run
    Files.writeString(Paths.get(s"$outDir/selected.json"),
      selected.keys.toSeq.sorted.map(q).mkString("[", ",", "]"))
    spark.stop()
  }
}
