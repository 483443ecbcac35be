package graft

import org.apache.spark.sql.functions._

import graft.queries.Incremental
import graft.util.Exact

class IncrementalSpec extends SparkSpec {

  test("q_incremental_agg equals a full recompute over all orders, exactly") {
    val merged = Incremental.qIncrementalAgg(spark, sf)
    val full = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy(col("o_custkey"))
      .agg(Exact.dsum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
    assert(merged.count() == full.count())
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty,
      "incremental merge diverges from full recompute")
    // the split is real: both the view and the batch contribute rows
    val batchOnly = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderkey") % 10 === 0)
    assert(batchOnly.count() > 0, "empty batch — split degenerate")
    assert(batchOnly.count() < full.selectExpr("sum(n_orders)").head.getLong(0),
      "batch covers everything — split degenerate")
    Incremental.resetStores()
  }
}
