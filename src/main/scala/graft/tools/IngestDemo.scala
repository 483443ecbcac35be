package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.{Ingest, Tables}

/** Sample code through the public I/O surface: CSV sink→source round
  * trip, partition-by parquet layout, schema-mismatch behavior.
  * Usage: sbt 'runMain graft.tools.IngestDemo'
  */
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "n_chars")

    Ingest.writeCsv(docs, "/tmp/graft_drive_csv")
    val back = Ingest.csv(spark, "/tmp/graft_drive_csv", "doc_id BIGINT, lang STRING, n_chars BIGINT")
    println(s"CSV round-trip: wrote ${docs.count()} read ${back.count()}")

    Ingest.writeParquet(Tables.documents(spark, sf), "/tmp/graft_drive_pq", Seq("lang"))
    println("partition dirs: " + new java.io.File("/tmp/graft_drive_pq")
      .list().filter(_.startsWith("lang=")).sorted.mkString(", "))

    try {
      val bad = Ingest.csv(spark, "/tmp/graft_drive_csv", "doc_id BIGINT, nonexistent_col STRING")
      bad.count()
      println("schema-mismatch read: NOT detected (positional mapping)")
    } catch {
      case e: Throwable =>
        println(s"schema-mismatch read rejected: ${e.getMessage.linesIterator.next().take(120)}")
    }
    spark.stop()
  }
}
