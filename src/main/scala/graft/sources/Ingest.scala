package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SaveMode, SparkSession}

/** Ingest/egress surface (SURVEY §2.F) — the reference's
  * `data-gathering` capability (Citavi CSV exports, MySQL tables,
  * scraped text) mapped to Spark's native connectors. Everything is a
  * lazy reader: schema projection and filters still reach the source
  * (CSV/JSON get column pruning; JDBC gets predicate pushdown).
  *
  * Scale notes: CSV/JSON readers take an explicit schema — schema
  * inference is a full extra pass over 100 TB. JDBC reads must be
  * partitioned (partitionColumn/bounds) or the whole table lands on
  * one task.
  */
object Ingest {

  /** CSV with explicit schema (header expected, like Citavi exports).
    * CAUTION: Spark maps CSV columns to the schema by POSITION, not by
    * header name; `enforceSchema=false` makes it check the header and
    * log a warning on mismatch (it does NOT throw — verified on Spark
    * 4.1). Callers must keep schema order aligned with the file. */
  def csv(spark: SparkSession, path: String, ddlSchema: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("enforceSchema", "false")
      .schema(ddlSchema)
      .csv(path)

  /** Line-delimited JSON with explicit schema. */
  def json(spark: SparkSession, path: String, ddlSchema: String): DataFrame =
    spark.read.schema(ddlSchema).json(path)

  /** Raw text corpus: one row per line (the scraped-chronicle shape). */
  def text(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Partitioned JDBC read (the MySQL tables of the reference).
    * Requires a JDBC driver on the classpath; bounds make Spark issue
    * `numPartitions` range-predicated queries instead of one big scan. */
  def jdbc(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int): DataFrameReader =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)

  /** ORC source — the other columnar lake format (predicate pushdown
    * and column pruning work like parquet's; Spark's ORC reader is
    * built in). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Shared columnar-sink plumbing: overwrite + the partition-by
    * layout knob that makes downstream reads partition-prunable. */
  private def writeColumnar(df: DataFrame, path: String, format: String,
      partitionBy: Seq[String]): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format(format)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }

  /** ORC sink, same partition-layout knob as [[writeParquet]]. */
  def writeOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit =
    writeColumnar(df, path, "orc", partitionBy)

  /** Parquet sink, optionally hash-partitioned by columns. */
  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit =
    writeColumnar(df, path, "parquet", partitionBy)

  /** CSV sink (quickstatements-style exports in the reference). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Text sink: one line per row over a single string column — the
    * shipped `.nt`/`.ttl` serialization shape the RDF exports publish
    * (create-rdf.py's file output). The round trip back is [[text]] →
    * [[graft.kg.Rdf.parseNt]]/[[graft.kg.Rdf.parseTtl]]. */
  def writeText(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).text(path)
}
