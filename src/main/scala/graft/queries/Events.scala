package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Event/product analytics over the `events` stream table (SURVEY
  * §2.C): the three classic session-level questions every analytics
  * deployment asks — funnel conversion, cohort retention, and
  * time-series gap filling.
  *
  * Determinism: every emitted value is an exact integer — event times
  * are carried as epoch MICROsecond longs (`unix_micros` ↔ DuckDB
  * `epoch_us`), and calendar bucketing is integer division on them
  * (day = µs div 86400e6, week = day div 7, hour = µs div 3600e6) —
  * no timezone logic, no date arithmetic that could differ across
  * engines.
  *
  * Scale notes (100 TB):
  *   - q_funnel is three conditional aggregations keyed on user_id —
  *     each pass is a map-side-partial groupBy; the step constraint
  *     ("click AFTER first view") joins each next pass against the
  *     previous step's per-user scalar, so state per user is one
  *     timestamp, never the event list.
  *   - q_retention reduces to (user → first week) + one distinct-count
  *     per (cohort, offset): the first-seen frame is user-sized, the
  *     output cohort-matrix-sized.
  *   - q_gap_fill densifies against a CALENDAR-sized axis (one
  *     sequence row per hour in the observed range — ~9k rows/year,
  *     independent of event volume), so the fill join is a small
  *     dimension against the aggregated (hour, type) census, not the
  *     raw stream.
  */
object Events {

  private val UsPerHour = 3600000000L
  private val UsPerDay = 86400000000L

  private def ev(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))

  /** q_funnel — ordered view → click → purchase conversion per user:
    * step k's timestamp is the FIRST event of that type strictly
    * after step k−1's (the standard ordered-funnel semantics), with
    * per-user reach 0–3. */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
    val users = e.select(col("user_id")).distinct()
    val s1 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("t_view"))
    val s2 = e.filter(col("event_type") === "click")
      .join(s1, Seq("user_id")).filter(col("us") > col("t_view"))
      .groupBy(col("user_id"), col("t_view")).agg(min(col("us")).as("t_click"))
    val s3 = e.filter(col("event_type") === "purchase")
      .join(s2.select("user_id", "t_click"), Seq("user_id")).filter(col("us") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t_purchase"))
    users
      .join(s1, Seq("user_id"), "left")
      .join(s2.select("user_id", "t_click"), Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
        (when(col("t_purchase").isNotNull, 3)
          .when(col("t_click").isNotNull, 2)
          .when(col("t_view").isNotNull, 1)
          .otherwise(0)).as("reached"))
  }

  /** q_retention — weekly cohort retention: cohort = the user's first
    * event week (integer week index from epoch), cell = distinct
    * users of that cohort active `week_offset` weeks later. */
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    val weeks = ev(spark, dir)
      .select(col("user_id"), expr(s"(us div ${UsPerDay}L) div 7").as("week"))
    val first = weeks.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    weeks.join(first, Seq("user_id"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count_distinct(col("user_id")).as("n_active"))
  }

  /** q_gap_fill — hourly event counts per type with calendar
    * densification: every hour in the observed range appears for
    * every type, zero-filled and flagged, so downstream charting /
    * anomaly logic never infers "no row" semantics. The hour axis is
    * one `sequence` over the 1-row global min/max — calendar-sized,
    * broadcast against the aggregated census. */
  def qGapFill(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir).withColumn("hour", expr(s"us div ${UsPerHour}L"))
    val counts = e.groupBy(col("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val range = e.agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
    val axis = range
      .select(explode(expr("sequence(h0, h1)")).as("hour"))
      .crossJoin(e.select(col("event_type")).distinct())
    axis.join(counts, Seq("hour", "event_type"), "left")
      .select(col("hour"), col("event_type"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("n_events").isNull.as("is_gap"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel"    -> (qFunnel _),
    "q_retention" -> (qRetention _),
    "q_gap_fill"  -> (qGapFill _))

  val oracles: Map[String, String] = Map(
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |u AS (SELECT DISTINCT user_id FROM e),
        |s1 AS (SELECT user_id, min(us) AS t_view FROM e WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, s1.t_view, min(e.us) AS t_click
        |       FROM e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.us > s1.t_view GROUP BY 1, 2),
        |s3 AS (SELECT e.user_id, min(e.us) AS t_purchase
        |       FROM e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.us > s2.t_click GROUP BY 1)
        |SELECT u.user_id, s1.t_view, s2.t_click, s3.t_purchase,
        |  CAST(CASE WHEN s3.t_purchase IS NOT NULL THEN 3
        |       WHEN s2.t_click IS NOT NULL THEN 2
        |       WHEN s1.t_view IS NOT NULL THEN 1
        |       ELSE 0 END AS INTEGER) AS reached
        |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |LEFT JOIN s3 USING (user_id)""".stripMargin,
    "q_retention" ->
      """WITH w AS (
        |  SELECT user_id, (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) // 7 AS week
        |  FROM events),
        |f AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY 1)
        |SELECT cohort_week, (week - cohort_week)::BIGINT AS week_offset,
        |  count(DISTINCT user_id) AS n_active
        |FROM w JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "q_gap_fill" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hour
        |  FROM events),
        |c AS (SELECT hour, event_type, count(*) AS n_events FROM e GROUP BY 1, 2),
        |r AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM e),
        |axis AS (
        |  SELECT g.hour, t.event_type
        |  FROM (SELECT unnest(generate_series(h0, h1)) AS hour FROM r) g,
        |       (SELECT DISTINCT event_type FROM e) t)
        |SELECT axis.hour, axis.event_type,
        |  coalesce(c.n_events, 0)::BIGINT AS n_events,
        |  (c.n_events IS NULL) AS is_gap
        |FROM axis LEFT JOIN c ON c.hour = axis.hour AND c.event_type = axis.event_type""".stripMargin)
}
