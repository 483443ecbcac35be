package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Robust statistics over the event stream (SURVEY §2.C): exact
  * median / MAD outlier detection — the monitoring query every
  * ingest pipeline runs, built on a DISTRIBUTED EXACT SELECTION
  * operator instead of a per-group sort.
  *
  * Why not `Window.partitionBy(type).orderBy(value)` + pick the middle
  * row: event-type cardinality is a handful, so that window sorts
  * each type's ENTIRE history in ONE task — the low-cardinality
  * serializer trap (SURVEY §5, the corpus_pack lesson). And why not
  * `percentile`-style interpolation: the interpolated midpoint is
  * arithmetic on two doubles whose evaluation order differs across
  * engines — the LOWER median (the value AT position ⌈n/2⌉) is a
  * data value, no arithmetic, hash-exact by construction.
  *
  * [[selectLowerMedian]] is the classic two-level selection: a coarse
  * value-bucket census locates the bucket containing position k
  * (census-sized cumsum per key), and only THAT bucket's rows are
  * sorted (per-task work = bucket size, not group size). A skewed
  * bucket recurses the same shape one level deeper; here one level
  * suffices and the spec asserts positional equality with a full
  * sort.
  *
  * Determinism: median and MAD are data values; the deviation is one
  * IEEE subtract + abs, the threshold one multiply — every hashed
  * column is either a data value or a single IEEE op on data values.
  */
object Robust {

  /** Exact lower median (the value at sorted position (n+1) div 2)
    * per `key`, without ever sorting a whole group in one task:
    * bucket census → per-key census cumsum → sort only the selected
    * bucket. Returns (key, outName). */
  def selectLowerMedian(df: DataFrame, key: String, value: String,
      outName: String): DataFrame = {
    val b = df.select(col(key), col(value)).withColumn("bkt", floor(col(value)).cast("long"))
    val census = b.groupBy(col(key), col("bkt")).agg(count(lit(1)).as("cnt"))
    val wcum = Window.partitionBy(col(key)).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // census-sized per key (≤ #buckets rows) — the level-2 cumsum,
    // same shape as corpus_pack's offset table
    val cum = census.withColumn("cum", sum(col("cnt")).over(wcum))
    val tot = census.groupBy(col(key)).agg(sum(col("cnt")).as("n"))
      .withColumn("k", expr("(n + 1) div 2"))
    val sel = cum.join(tot, Seq(key))
      .filter(col("cum") - col("cnt") < col("k") && col("k") <= col("cum"))
      .select(col(key), col("bkt"), (col("k") - (col("cum") - col("cnt"))).as("off"))
    // only the selected bucket's rows survive the join — the sort
    // below touches bucket-sized data per key, never the group
    b.join(sel, Seq(key, "bkt"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(key)).orderBy(col(value))))
      .filter(col("rn") === col("off"))
      .select(col(key), col(value).as(outName))
  }

  /** q_outliers — robust anomaly flags per event type: |value − med| >
    * 3·MAD, with med and MAD both exact lower medians. The med/MAD
    * frames are one row per event type (bounded domain → broadcast);
    * the deviation pass re-scans events rather than checkpointing an
    * event-sized frame. */
  def qOutliers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    val med = selectLowerMedian(ev, "event_type", "value", "med")
    val dev = ev.join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs(col("value") - col("med")))
    val mad = selectLowerMedian(dev, "event_type", "dev", "mad")
    dev.join(broadcast(mad), Seq("event_type"))
      .filter(col("dev") > lit(3.0) * col("mad"))
      .select(col("event_id"), col("event_type"), col("value"), col("med"), col("mad"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_outliers" -> (qOutliers _))

  val oracles: Map[String, String] = Map(
    // the oracle replicates the POSITIONAL definition (value at rank
    // (n+1)//2) with plain windows — engine quantile functions with
    // their own interpolation rules never enter
    "q_outliers" ->
      """WITH ev AS (SELECT event_id, event_type, value FROM events),
        |n AS (SELECT event_type, count(*) AS n, (count(*) + 1) // 2 AS k FROM ev GROUP BY 1),
        |medr AS (SELECT event_type, value,
        |         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn FROM ev),
        |med AS (SELECT m.event_type, m.value AS med
        |        FROM medr m JOIN n USING (event_type) WHERE m.rn = n.k),
        |dev AS (SELECT ev.event_id, ev.event_type, ev.value, med.med,
        |          abs(ev.value - med.med) AS dev
        |        FROM ev JOIN med USING (event_type)),
        |madr AS (SELECT event_type, dev,
        |         row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn FROM dev),
        |mad AS (SELECT m.event_type, m.dev AS mad
        |        FROM madr m JOIN n USING (event_type) WHERE m.rn = n.k)
        |SELECT d.event_id, d.event_type, d.value, d.med, mad.mad
        |FROM dev d JOIN mad USING (event_type)
        |WHERE d.dev > 3.0e0 * mad.mad""".stripMargin)
}
