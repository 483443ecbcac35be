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

  test("q_cdc_merge: every CDC path lands in the right final state") {
    val out = Incremental.qCdcMerge(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getString(3))).toMap
    val keys = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0))
    keys.foreach { k =>
      (k % 14 == 0, k % 7 == 0, k % 4 == 0) match {
        case (true, _, _) => // delete then re-insert: latest op wins
          assert(out(k)._1.startsWith("REINS ") && out(k)._3 == "I", s"key $k")
        case (_, true, _) => // deleted, never resurrected
          assert(!out.contains(k), s"key $k should be deleted")
        case (_, _, true) => // updated in place
          assert(out(k)._1.startsWith("UPD1 ") && out(k)._3 == "U", s"key $k")
        case _ => // untouched rows survive from the base snapshot
          assert(out.contains(k) && out(k)._2 == 0L, s"key $k")
      }
      if (k % 11 == 0) // fresh inserts land under the new key space
        assert(out(k + 1000000000L)._1.startsWith("NEW "), s"fresh key $k")
    }
  }

  test("q_scd2: versions tile each key's history; current row = the CDC snapshot") {
    val hist = Incremental.qScd2(spark, sf).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
    assert(hist.nonEmpty)
    hist.groupBy(_._1).foreach { case (k, vs) =>
      // versions are disjoint and ordered: each closes where the next
      // op (possibly a delete) begins; at most one is current
      val sorted = vs.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Array((_, _, _, Some(to), _), (_, _, from, _, _)) =>
          assert(to <= from, s"key $k overlapping versions")
        case _ =>
      }
      assert(vs.count(_._5) <= 1, s"key $k has two current versions")
      vs.foreach { case (_, _, from, to, cur) =>
        assert(cur == to.isEmpty)
        to.foreach(t => assert(t > from))
      }
    }
    // the current (open) versions are EXACTLY the q_cdc_merge snapshot
    val current = hist.filter(_._5).map(v => (v._1, v._2, v._3)).toSet
    val snap = Incremental.qCdcMerge(spark, sf).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2))).toSet
    assert(current == snap, s"${current.size} current vs ${snap.size} snapshot")
  }
}
