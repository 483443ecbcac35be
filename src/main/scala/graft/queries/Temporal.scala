package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Exact._

/** Temporal joins (SURVEY §2.C) — the two event-time join shapes Spark
  * has no built-in operator for, composed from sort/window/equi-join
  * primitives so Catalyst still owns the physical plan. Both run over
  * the `events` stream (the only table with sub-second time), keyed by
  * user — the attribution topology of a production event pipeline.
  *
  * Scale notes (100 TB):
  * - The as-of join is the UNION + sorted carry-forward shape: one
  *   shuffle on the join key, each row visited once by the window —
  *   never the naive join-then-argmax, whose intermediate is
  *   |right| × (left rows per user) and whose per-key top-1 repeats
  *   per right row. This is how a merge-based as-of engine
  *   distributes: co-partition both inputs, interleave by time,
  *   carry state forward.
  * - The range join is BANDED: each anchor row expands to the fixed
  *   number of day buckets its window can overlap (2 for a 24 h
  *   window — bounded fan-out via `explode(sequence(...))`), probe
  *   rows carry their own day bucket, and the join is an equi-join on
  *   (user, bucket) with the exact µs range predicate on top. Without
  *   the band key a time-range join degenerates to
  *   BroadcastNestedLoop/cartesian; with it, candidates are bounded
  *   by true matches × band width. Every true pair shares exactly one
  *   bucket (the probe row's own day), so banding introduces no
  *   duplicates and needs no post-dedup.
  */
object Temporal {

  private val DayUs = 86400000000L

  /** Exact long floor-division (µs epoch → UTC day bucket). Stays in
    * SQL `div`: `Column./` is double division, and at 2^50-scale epoch
    * values a round-to-nearest quotient can cross an integer boundary
    * before the truncating cast. */
  private def dayBucket(usExpr: String): Column =
    expr(s"($usExpr) div ${DayUs}L")

  /** Generic backward as-of join — the library operator behind
    * [[qAsofJoin]]: for every probe row, attach the build row with the
    * greatest (time, payload) not after the probe's time within the
    * same key group; probe rows with no eligible build row keep nulls.
    *
    * - `key`/`time` name columns present in BOTH frames (the equi key
    *   and the event-time ordering column — any orderable type:
    *   timestamp, long, ...).
    * - `payload` names the build columns to attach. Ties on `time`
    *   resolve to the LARGEST payload struct (field-lexicographic), so
    *   lead with a unique id column for fully deterministic output.
    * - Probe columns pass through unchanged; payload names must not
    *   collide with them (rename before the call).
    *
    * Plan shape: union both sides, one hash shuffle on `key`, one
    * window sort, `last(_, ignoreNulls)` carry-forward — never the
    * probe × build-rows-per-key pair explosion of join+argmax. */
  def asofJoin(probe: DataFrame, build: DataFrame,
      key: String, time: String, payload: Seq[String]): DataFrame = {
    val collide = payload.filter(probe.columns.contains)
    require(collide.isEmpty,
      s"payload column(s) ${collide.mkString(", ")} collide with probe columns — rename before the call")
    val payStruct = struct(payload.map(col): _*)
    val payType = build.select(payStruct).schema.head.dataType
    val rowType = probe.select(struct(probe.columns.map(col): _*)).schema.head.dataType
    val b = build.select(col(key).as("__k"), col(time).as("__t"), lit(0).as("__kind"),
      payStruct.as("__pay"), lit(null).cast(rowType).as("__row"))
    val p = probe.select(col(key).as("__k"), col(time).as("__t"), lit(1).as("__kind"),
      lit(null).cast(payType).as("__pay"), struct(probe.columns.map(col): _*).as("__row"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__kind"), col("__pay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.unionAll(p)
      .select(col("__kind"), col("__row"),
        last(col("__pay"), ignoreNulls = true).over(w).as("__m"))
      .filter(col("__kind") === 1)
      .select(probe.columns.map(c => col(s"__row.$c").as(c)) ++
        payload.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** q_asof_join — last-touch attribution: for every `purchase` event,
    * the same user's latest `click` or `view` at or before the
    * purchase time (backward as-of; ties broken by max event_id —
    * the payload struct leads with it; purchases with no prior
    * interaction keep nulls). Delegates to [[asofJoin]]; an
    * interaction AT the purchase µs is visible to it (<= semantics)
    * because build rows sort before probe rows at equal time. */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val src = ev.filter(col("event_type").isin("click", "view")).select(
      col("user_id"), col("ts"),
      col("event_id").as("attr_event_id"), col("event_type").as("attr_event_type"),
      col("ts").as("attr_ts"))
    val buy = ev.filter(col("event_type") === "purchase").select(
      col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    asofJoin(buy, src, key = "user_id", time = "ts",
      payload = Seq("attr_event_id", "attr_event_type", "attr_ts"))
      .select(
        col("purchase_id"),
        col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        col("attr_event_id"),
        col("attr_event_type"),
        date_format(col("attr_ts"), "yyyy-MM-dd HH:mm:ss").as("attr_ts"))
  }

  /** Generic banded time-range join — the library operator behind
    * [[qRangeJoin]]: every (anchor, probe) pair sharing `key` with
    * `probe.timeUs` in `[anchor.timeUs, anchor.timeUs + windowUs)`.
    * Both frames carry an epoch-µs long column named by `time`
    * (probe columns otherwise pass through; names must not collide).
    *
    * Plan shape: anchors explode to the `⌈windowUs/DayUs⌉ + 1` day
    * buckets their window can overlap (bounded fan-out), probes carry
    * their own bucket, and the join is the equi-join on (key, bucket)
    * with the exact µs predicate on top — never a
    * BroadcastNestedLoop/cartesian. A true pair shares exactly one
    * bucket (the probe's own day), so banding needs no post-dedup. */
  def bandedRangeJoin(anchor: DataFrame, probe: DataFrame,
      key: String, time: String, windowUs: Long): DataFrame = {
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    require(!probe.columns.contains("__bucket") && !anchor.columns.contains("__bucket"),
      "bandedRangeJoin reserves the column name '__bucket'; rename it on the input frames")
    require(!anchor.columns.exists(_.startsWith("__a_")),
      "bandedRangeJoin reserves the '__a_' column-name prefix on the anchor frame")
    val a = anchor.select(anchor.columns.map(c => col(c).as(s"__a_$c")): _*)
      .withColumn("__bucket", explode(sequence(
        dayBucket(s"__a_$time"),
        dayBucket(s"__a_$time + ${windowUs}L - 1"))))
    val p = probe.withColumn("__bucket", dayBucket(time))
    a.join(p, col(s"__a_$key") === col(key) && p("__bucket") === a("__bucket"))
      .filter(col(time) >= col(s"__a_$time") &&
        col(time) < col(s"__a_$time") + lit(windowUs))
      .drop("__bucket")
      .select(anchor.columns.map(c => col(s"__a_$c").as(c)) ++
        probe.columns.filterNot(c => c == key || c == time)
          .map(c => col(c)): _*)
  }

  /** q_range_join — first-day activity: for every `signup` event, the
    * same user's events with time in [signup, signup + 24 h), counted
    * and value-summed (exact decimal). The signup itself falls in its
    * own window, so every signup emits a row (n_events ≥ 1).
    * [[bandedRangeJoin]] instantiated on (user_id, epoch-µs ts). */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val anchor = ev.filter(col("event_type") === "signup").select(
      col("event_id").as("signup_id"), col("user_id"),
      unix_micros(col("ts")).as("t_us"), col("ts").as("signup_ts"))
    val probe = ev.select(col("user_id"), unix_micros(col("ts")).as("t_us"), col("value"))
    bandedRangeJoin(anchor, probe, key = "user_id", time = "t_us", windowUs = DayUs)
      .groupBy(col("signup_id"), col("user_id"), col("signup_ts"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("signup_id"), col("user_id"),
        date_format(col("signup_ts"), "yyyy-MM-dd HH:mm:ss").as("signup_ts"),
        col("n_events"), col("sum_value"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join"  -> (qAsofJoin _),
    "q_range_join" -> (qRangeJoin _))

  val oracles: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH src AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        |  FROM events WHERE event_type IN ('click', 'view')
        |), buy AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'purchase'
        |), ranked AS (
        |  SELECT buy.event_id AS purchase_id, src.event_id, src.event_type, src.ts,
        |    row_number() OVER (PARTITION BY buy.event_id
        |                       ORDER BY src.ts DESC, src.event_id DESC) AS rn
        |  FROM buy JOIN src ON src.user_id = buy.user_id AND src.ts <= buy.ts
        |)
        |SELECT buy.event_id AS purchase_id, buy.user_id,
        |  strftime(buy.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  b.event_id AS attr_event_id, b.event_type AS attr_event_type,
        |  strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS attr_ts
        |FROM buy LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) b
        |  ON b.purchase_id = buy.event_id""".stripMargin,
    "q_range_join" ->
      """SELECT s.event_id AS signup_id, s.user_id,
        |  strftime(CAST(s.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS signup_ts,
        |  count(*) AS n_events,
        |  CAST(CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DECIMAL(25,4)) AS DOUBLE) AS sum_value
        |FROM events s JOIN events e
        |  ON e.user_id = s.user_id
        | AND epoch_us(CAST(e.ts AS TIMESTAMP)) >= epoch_us(CAST(s.ts AS TIMESTAMP))
        | AND epoch_us(CAST(e.ts AS TIMESTAMP)) < epoch_us(CAST(s.ts AS TIMESTAMP)) + 86400000000
        |WHERE s.event_type = 'signup'
        |GROUP BY 1, 2, 3""".stripMargin)
}
