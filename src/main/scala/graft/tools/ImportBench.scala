package graft.tools

import graft.kg.Rdf

/** Dev tool: separates the PRODUCTION import cost (spark.read.text
  * over shipped .nt/.ttl files → parse) from the self-contained
  * render round trip the bench's kg_import_* keys measure (render +
  * eager localCheckpoint + parse). Writes the exports to text files
  * once (the shipped-dump shape), then times both paths same-JVM,
  * ABTime-style (every rep printed; this box's cross-process
  * wall-clock varies ±4× — SURVEY §5).
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.ImportBench [reps] */
object ImportBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.flatMap(_.toIntOption).getOrElse(3)
    val out = java.nio.file.Files.createTempDirectory("graft_import_bench").toString

    def time(label: String)(body: => Unit): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      println(f"IMPORTBENCH $label reps=$reps ${times.map(t => f"$t%.2f").mkString(" ")}s")
    }

    // one-time file publication (not part of either measured path)
    graft.sources.Ingest.writeText(Rdf.kgExportNt(spark, dir), s"$out/nt")
    graft.sources.Ingest.writeText(Rdf.kgExportTtl(spark, dir), s"$out/ttl")

    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("file_import_nt") { drain(Rdf.kgImportNtFile(spark, s"$out/nt")) }
    time("file_import_ttl") { drain(Rdf.kgImportTtlFile(spark, s"$out/ttl")) }
    // the render round trip, reset per rep so each rep pays the full
    // render+checkpoint+parse cost (what the driver bench's COLD sees)
    time("roundtrip_nt_cold") { Rdf.resetMemo(); drain(Rdf.kgImportNt(spark, dir)) }
    time("roundtrip_ttl_cold") { Rdf.resetMemo(); drain(Rdf.kgImportTtl(spark, dir)) }
    // and memo-warm (what the driver bench's WARM sees)
    time("roundtrip_ttl_warm") { drain(Rdf.kgImportTtl(spark, dir)) }
    spark.stop()
  }
}
