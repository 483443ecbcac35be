package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.sources.Tables
import graft.util.Exact._

/** Relational analytics core (SURVEY §2.C) — the bench headliners.
  *
  * Scale notes (100 TB): every query here is a declarative DataFrame
  * plan — filters/projections reach the parquet scan, dimension sides
  * (region/nation/supplier/part at production skew) are broadcast, and
  * all aggregates are map-side-partial. Money math is exact DECIMAL
  * (see [[graft.util.Exact]]) so results are parallelism-independent.
  */
object Relational {

  /** TPC-H Q1-class pricing summary: one scan, partial-agg groupBy. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        revenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q3-class: fact-fact shuffle join + broadcast dim filter, top-N. */
  def q3JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > lit("2000-01-01").cast("timestamp"))
    // orders⋈lineitem shuffles on orderkey; customer GROWS with SF
    // (not a bounded dimension), so no forced hint — AQE broadcasts
    // the filtered side while it fits and shuffles at scale.
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(revenue(col("l_extendedprice"), col("l_discount")).as("rev"))
      .select(
        col("l_orderkey"),
        dayStr(col("o_orderdate")).as("orderdate"),
        col("o_orderpriority"),
        col("rev"))
      .orderBy(col("rev").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-class 6-way star join. Only the BOUNDED domains
    * (region/nation) carry broadcast hints; customer and supplier grow
    * linearly with SF, so their joins are left to AQE (broadcast under
    * the threshold, shuffle at scale — never a driver OOM). */
  def q5MultiJoin(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(revenue(col("l_extendedprice"), col("l_discount")).as("rev"))
      .orderBy(col("n_name"))
  }

  /** Window functions: row_number + exact running sum per customer. */
  def qWindow(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.select(
        col("o_custkey"),
        col("o_orderkey"),
        dayStr(col("o_orderdate")).as("orderdate"),
        row_number().over(w).as("rn"),
        exactDouble(sum(money(col("o_totalprice"))).over(wRun)).as("running_total"))
      .filter(col("rn") <= 5)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Top-k per group via rank window (deterministic tiebreak on key). */
  def qTopkGroup(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc, col("p_partkey"))
    p.select(col("p_brand"), col("p_partkey"), col("p_name"), col("p_retailprice"),
        row_number().over(w).as("rk"))
      .filter(col("rk") <= 3)
      .orderBy(col("p_brand"), col("rk"))
  }

  /** Left-semi (EXISTS) + left-anti (NOT EXISTS), unioned with a tag. */
  def qSemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val p = Tables.part(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(lit("has_order").as("kind"), col("c_custkey").as("key"), col("c_name").as("name"))
    val anti = p.join(l, col("p_partkey") === col("l_partkey"), "left_anti")
      .select(lit("never_ordered").as("kind"), col("p_partkey").as("key"), col("p_name").as("name"))
    semi.unionAll(anti).orderBy("kind", "key")
  }

  /** GROUP BY ROLLUP over the region→nation hierarchy. */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_acctbal"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_customers"), col("sum_acctbal"))
      .orderBy("region", "nation")
  }

  /** GROUP BY CUBE over priority × status: all four grouping sets in
    * one pass (Spark expands the cube BEFORE the shuffle — partial
    * aggregation still applies per grouping set). `grouping_id` tags
    * which set a row belongs to; both engines use the same bit order
    * (first column = most significant bit — verified empirically). */
  def qCube(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("gid"), col("n_orders"), col("sum_price"))
      .orderBy("gid", "priority", "status")
  }

  /** GROUP BY GROUPING SETS — the explicit-set form rollup/cube can't
    * express: each dimension aggregated independently (priority-only
    * and status-only marginals) in ONE pass over the fact table.
    * Same engine shape as [[qCube]]: Spark expands the sets before the
    * shuffle, partial aggregation applies per set, `grouping_id`
    * disambiguates. One scan replaces two single-dimension groupBys —
    * at 100 TB that halves the fact reads for marginal reports. */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.groupingSets(
        Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus"))),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("gid"), col("n_orders"), col("sum_price"))
      .orderBy("gid", "priority", "status")
  }

  /** Pivot: orders count per priority × status (conditional agg → no shuffle beyond one groupBy). */
  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def cnt(status: String) = count(when(col("o_orderstatus") === status, 1)).as(s"n_$status")
    o.groupBy(col("o_orderpriority"))
      .agg(cnt("O"), cnt("F"), cnt("P"))
      .orderBy("o_orderpriority")
  }

  /** Sessionization: 30-minute-gap sessions per user (lag + cumulative sum). */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(wOrd)
    e.select(col("user_id"), col("event_id"), col("ts"), col("value"),
        when(gapUs.isNull || gapUs > lit(1800000000L), 1).otherwise(0).as("is_new"))
      .withColumn("session_id", sum(col("is_new")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        dsum(col("value")).as("session_value"))
      .orderBy("user_id", "session_id")
  }

  /** Exact per-group percentiles at binary-exact fractions (.25/.5/.75). */
  def qPercentile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.75)").as("p75"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"        -> (q1Agg _),
    "q3_join_agg"   -> (q3JoinAgg _),
    "q5_multi_join" -> (q5MultiJoin _),
    "q_window"      -> (qWindow _),
    "q_topk_group"  -> (qTopkGroup _),
    "q_semi_anti"   -> (qSemiAnti _),
    "q_rollup"      -> (qRollup _),
    "q_cube"        -> (qCube _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_pivot"       -> (qPivot _),
    "q_sessionize"  -> (qSessionize _),
    "q_percentile"  -> (qPercentile _))

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(25,4)) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(25,4)) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q3_join_agg" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(25,4)) AS DOUBLE) AS rev
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '2000-01-01'
        |  AND l_shipdate > TIMESTAMP '2000-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY rev DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_multi_join" ->
      """SELECT n_name,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(25,4)) AS DOUBLE) AS rev
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_window" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |    CAST(row_number() OVER w AS INTEGER) AS rn,
        |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(25,4)) AS DOUBLE) AS running_total
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |) WHERE rn <= 5 ORDER BY o_custkey, rn""".stripMargin,
    "q_topk_group" ->
      """SELECT * FROM (
        |  SELECT p_brand, p_partkey, p_name, p_retailprice,
        |    CAST(row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS INTEGER) AS rk
        |  FROM part
        |) WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin,
    "q_semi_anti" ->
      """SELECT 'has_order' AS kind, c_custkey AS key, c_name AS name
        |FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'never_ordered' AS kind, p_partkey AS key, p_name AS name
        |FROM part WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |ORDER BY kind, key""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
        |  count(*) AS n_customers,
        |  CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DECIMAL(25,4)) AS DOUBLE) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY region, nation""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
        |  coalesce(o_orderstatus, 'ALL') AS status,
        |  CAST(GROUPING(o_orderpriority, o_orderstatus) AS INTEGER) AS gid,
        |  count(*) AS n_orders,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(25,4)) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY CUBE (o_orderpriority, o_orderstatus)
        |ORDER BY gid, priority, status""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
        |  coalesce(o_orderstatus, 'ALL') AS status,
        |  CAST(GROUPING(o_orderpriority, o_orderstatus) AS INTEGER) AS gid,
        |  count(*) AS n_orders,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(25,4)) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        |ORDER BY gid, priority, status""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_O,
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_F,
        |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_sessionize" ->
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
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
