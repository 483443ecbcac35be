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

  /** Open-session state: (session index, start ms, last ms, n events,
    * value sum in micro-units — scaled long reproduces the
    * DECIMAL(18,6) exact-sum semantics of [[graft.util.Exact]]). */
  type SessState = (Long, Long, Long, Long, Long)
  final case class SessOut(user_id: Long, session_id: Long, n_events: Long,
      session_start: String, session_value: Double)

  // object-level (reached via the static module from executor closures —
  // DateTimeFormatter is not Serializable, so it must not be captured)
  private val sessGapMs = 1800000L
  private def sessFmt(ms: Long): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.ofEpochMilli(ms))
  private def micros(v: Double): Long =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.movePointRight(6).longValueExact()

  private def sessEmit(userId: Long, events: Iterator[Ev],
      state: org.apache.spark.sql.streaming.GroupState[SessState]): Iterator[SessOut] = {
    def out(s: SessState) =
      SessOut(userId, s._1, s._4, sessFmt(s._2),
        BigDecimal(BigInt(s._5), 6).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    if (!events.hasNext) { // event-time timeout: seal the open session
      val closed = state.getOption.map(out).toList
      state.remove()
      return closed.iterator
    }
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    var sessions = List.empty[SessOut]
    var cur = state.getOption
    for (e <- sorted) {
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s._3 <= sessGapMs =>
          cur = Some((s._1, s._2, t, s._4 + 1, s._5 + micros(e.value)))
        case Some(s) =>
          sessions ::= out(s)
          cur = Some((s._1 + 1, t, t, 1L, micros(e.value)))
        case None =>
          cur = Some((1L, t, t, 1L, micros(e.value)))
      }
    }
    state.update(cur.get)
    state.setTimeoutTimestamp(cur.get._3 + sessGapMs)
    sessions.reverse.iterator
  }

  /** Run `body` with a reduced shuffle-partition count: streaming
    * state stores cost per partition per microbatch, and the replayed
    * test streams are small — 8 partitions beats dragging the batch
    * engine's 32 through 3 microbatches of state-store I/O. (On a real
    * cluster, size state partitions to key cardinality instead.) */
  private def withFewPartitions[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "8")
    try body finally spark.conf.set(key, prev)
  }

  /** stream_window_agg — 1-hour tumbling windows per event_type. */
  def streamWindowAgg(spark: SparkSession, dir: String): DataFrame = withFewPartitions(spark) {
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

  /** stream_sessionize — custom per-key state via
    * flatMapGroupsWithState: 30-minute-gap sessions per user, emitted
    * when the event-time timeout seals them. Exactly reproduces the
    * batch sessionization (same oracle as q_sessionize's logic), so
    * the custom-state path is hash-checked, not just smoke-tested.
    *
    * State per user = the open session only (bounded); sessions close
    * either when a later event arrives past the gap or when the
    * watermark passes the gap timeout — the production pattern for
    * sessionization over an unbounded stream.
    */
  def streamSessionize(spark: SparkSession, dir: String): DataFrame = withFewPartitions(spark) {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout

    val rows = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Ev].collect().toSeq
    val maxTs = rows.map(_.ts.getTime).max
    def sentinel(offsetH: Int) =
      Ev(-1L, new Timestamp(maxTs + offsetH * 3600L * 1000), -1L, "sentinel", 0.0)

    implicit val sc = spark.sqlContext
    val source = MemoryStream[Ev]
    val sessions = source.toDS()
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(sessEmit _)
    val sinkName = "graft_stream_sessions"
    val q = sessions.toDF().writeStream.format("memory").queryName(sinkName)
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(rows)
      q.processAllAvailable()
      source.addData(Seq(sentinel(3)))
      q.processAllAvailable()
      source.addData(Seq(sentinel(6)))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(sinkName).filter(col("user_id") >= 0)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_window_agg" -> (streamWindowAgg _),
    "stream_sessionize" -> (streamSessionize _))

  val oracles: Map[String, String] = Map(
    "stream_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP)) > 1800000000
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sessions AS (
        |  SELECT user_id, event_id, ts, value,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  strftime(min(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(25,4)) AS DOUBLE) AS session_value
        |FROM sessions GROUP BY user_id, session_id""".stripMargin,
    "stream_window_agg" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS wstart,
        |  event_type, count(*) AS n_events,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(25,4)) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin)
}
