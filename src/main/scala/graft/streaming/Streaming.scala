package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.sources.Tables
import graft.util.Exact._

/** Structured Streaming (SURVEY §2.E): tumbling-window aggregation
  * with a watermark, replayed deterministically through a memory
  * source/sink so the DuckDB batch oracle can check it.
  *
  * Production shape: `spark.readStream` (Kafka/files) → withWatermark
  * → window agg → `writeStream` with checkpointing; state lives in the
  * state store, partitioned by grouping key. The test harness here
  * feeds the same rows through MemoryStream in APPEND mode — late
  * sentinel batches advance the watermark so every real window is
  * sealed and emitted, proving the watermark path (not just
  * complete-mode replay).
  *
  * Scale notes: tumbling windows + watermark = bounded state (only
  * unsealed windows are held); the aggregation shuffles once on
  * (window, event_type). Money math is exact DECIMAL, so emitted rows
  * are identical at any parallelism.
  */
object Streaming {

  final case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** stream_window_agg — 1-hour tumbling windows per event_type. */
  def streamWindowAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Ev].collect().toSeq // test harness only: prod reads Kafka/files

    val maxTs = rows.map(_.ts.getTime).max
    def sentinel(offsetH: Int) =
      Ev(-1L, new Timestamp(maxTs + offsetH * 3600L * 1000), -1L, "sentinel", 0.0)

    implicit val sc = spark.sqlContext
    val source = MemoryStream[Ev]
    val agg = source.toDF()
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(money(col("value"))).as("sum_value_dec"))
    val sinkName = "graft_stream_out"
    val q = agg.writeStream.format("memory").queryName(sinkName)
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(rows)
      q.processAllAvailable()
      // two sentinel batches: the first advances the watermark past all
      // real windows, the second triggers their emission
      source.addData(Seq(sentinel(3)))
      q.processAllAvailable()
      source.addData(Seq(sentinel(6)))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(sinkName)
      .filter(col("event_type") =!= "sentinel")
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("event_type"),
        col("n_events"),
        exactDouble(col("sum_value_dec")).as("sum_value"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_window_agg" -> (streamWindowAgg _))

  val oracles: Map[String, String] = Map(
    "stream_window_agg" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS wstart,
        |  event_type, count(*) AS n_events,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(25,4)) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin)
}
