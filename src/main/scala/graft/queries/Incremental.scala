package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Exact

/** Incremental view maintenance (SURVEY §2.C): the continuous-
  * aggregation production shape — a per-customer revenue view is kept
  * as a PERSISTED partial-aggregate store, and each new order batch
  * merges its own partials into the view without ever rescanning
  * history. The relational twin of `dedup_incremental` /
  * `er_incremental`: history is touched only through the bucketed
  * store, never re-aggregated.
  *
  * Exactness: the store keeps the DECIMAL partial sum (never the
  * rounded double) — merging partials is then exact decimal addition,
  * so the merged view is bit-identical to a full recompute over all
  * orders, which is precisely what the oracle checks. The double cast
  * happens once, at the output surface ([[Exact.exactDouble]]).
  *
  * Scale notes (100 TB): the store is bucketed+sorted on `o_custkey`,
  * so the merge is a co-located full-outer SMJ — the store side reads
  * straight into the join with NO exchange at any view size; only the
  * batch's (much smaller) partial aggregate shuffles to the bucket
  * count. ScaleSpec asserts the single-exchange plan. This is the
  * standard warehouse "merge into summary table" pattern with the
  * summary layout chosen so the merge never moves the summary.
  */
object Incremental {

  /** History/batch split: order keys ≡ 0 (mod 10) are the new batch. */
  private def isBatch = col("o_orderkey") % 10 === 0

  /** View bucket count — the batch side shuffles TO this layout (see
    * [[qIncrementalAgg]]). */
  private val NBuckets = 8

  private def partials(df: DataFrame): DataFrame =
    df.groupBy(col("o_custkey"))
      .agg(sum(Exact.money(col("o_totalprice"))).as("rev_partial"),
        count(lit(1)).as("n_orders"))

  /** The persisted per-customer partial-aggregate store over
    * HISTORICAL orders, built once per (session, dir) and re-read as
    * a bucketed managed table. */
  private val storeMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  private[graft] def aggStoreTable(spark: SparkSession, dir: String): String =
    storeMemo.getOrElseUpdate((spark, dir), {
      val tag = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      val t = s"graft_aggstore_$tag"
      graft.util.Scale.writeBucketed(
        partials(Tables.orders(spark, dir).filter(!isBatch)), t, "o_custkey", NBuckets)
      t
    })

  /** Drop the memoized agg store (Bench cold honesty — mirrors
    * [[graft.dedup.Dedup.resetStores]]). */
  def resetStores(): Unit = {
    storeMemo.foreach { case ((spark, _), t) => spark.sql(s"DROP TABLE IF EXISTS $t") }
    storeMemo.clear()
  }

  /** q_incremental_agg — merge the new batch's partial aggregate into
    * the persisted view: full-outer co-located SMJ on `o_custkey`,
    * exact decimal partial addition, result identical to a full
    * recompute over ALL orders (the oracle). */
  def qIncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val store = spark.table(aggStoreTable(spark, dir)).hint("merge")
      .select(col("o_custkey"), col("rev_partial").as("rev_s"), col("n_orders").as("n_s"))
    // the batch shuffles to the VIEW's bucket layout before its partial
    // agg (one explicit exchange, reused by both the agg and the join).
    // Left to itself the planner reuses the agg's default-width
    // partitioning and re-shuffles the STORE side to match — shuffling
    // the view-sized side to spare the batch-sized one, exactly
    // backwards at scale (observed: store scan "Bucketed: false
    // (disabled by query planner)" + store-side Exchange).
    val batch = partials(Tables.orders(spark, dir).filter(isBatch)
        .repartition(NBuckets, col("o_custkey")))
      .select(col("o_custkey"), col("rev_partial").as("rev_b"), col("n_orders").as("n_b"))
    store.join(batch, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        Exact.exactDouble(
          coalesce(col("rev_s"), lit(0)) + coalesce(col("rev_b"), lit(0))).as("revenue"),
        (coalesce(col("n_s"), lit(0L)) + coalesce(col("n_b"), lit(0L))).as("n_orders"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_incremental_agg" -> (qIncrementalAgg _))

  val oracles: Map[String, String] = Map(
    "q_incremental_agg" ->
      """SELECT o_custkey,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(25,4)) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders GROUP BY 1""".stripMargin)
}
