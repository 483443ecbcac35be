package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // runs per query; the per-query number reported is the MEDIAN, so
    // round-over-round regressions are detectable through the ±40%
    // single-run machine noise documented in SURVEY §5
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var failed = List.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        // measure standalone cold cost: cross-query memos (shared ER
        // component map) would otherwise zero out reps 2..n
        graft.er.ER.resetMemo()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9 ) }
        catch { case e: Throwable =>
          if (!failed.contains(name)) failed ::= name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          None
        }
      }
      val median =
        if (times.isEmpty) 0.0
        else times.sorted.apply(times.size / 2)
      name -> median
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
