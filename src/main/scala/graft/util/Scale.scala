package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout and skew utilities for the 100 TB path.
  *
  * Bucketing: writing both sides of a recurring fact-fact join
  * bucketed (and sorted) by the join key makes the join CO-LOCATED —
  * Spark's scan preserves the bucket partitioning, so the sort-merge
  * join runs with NO Exchange on either side. At 100 TB that removes
  * the two largest shuffles in the pipeline; the spec asserts the
  * exchange-free plan.
  *
  * Salting: when one join key is hot (the "Smith" problem), a plain
  * shuffle join puts the whole key on one task. `saltedJoin` spreads
  * the large side across `nSalts` sub-keys and replicates the small
  * side to match — result-identical to the plain join, parallelism ×
  * nSalts on the hot key. (AQE's skew-join split handles moderate
  * skew automatically; salting is for the pathological keys AQE can't
  * split, e.g. a single key larger than an executor.)
  */
object Scale {

  /** Write `df` as a bucketed+sorted managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — co-located, no
    * exchange (hint forces SMJ so the demo isn't broadcast). */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable).hint("merge"), key)

  /** Salted equi-join: result-identical to `large.join(small, key)`,
    * with the large side spread over `nSalts` sub-keys. The salt is
    * derived per-row (uniform), the small side is replicated nSalts×. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, nSalts: Int): DataFrame = {
    val salted = large.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(nSalts.toLong)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(array((0 until nSalts).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
