package graft

import org.apache.spark.sql.functions._

import graft.queries.Robust

class RobustSpec extends SparkSpec {

  test("selectLowerMedian equals the full-sort positional median (never sorting a group whole)") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), col("value"))
    val got = Robust.selectLowerMedian(ev, "event_type", "value", "med")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // naive: collect and sort per group in memory
    val naive = ev.collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (t, vs) =>
        val sorted = vs.map(_._2).sorted
        t -> sorted((sorted.length + 1) / 2 - 1)
      }
    assert(got == naive, s"two-level selection diverges: $got vs $naive")
  }

  test("q_outliers flags exactly the |v - med| > 3*MAD rows, and only those") {
    val rows = Robust.qOutliers(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, t, v, med, mad) =>
      assert(math.abs(v - med) > 3.0 * mad, s"event $id ($t) not an outlier: |$v-$med| <= 3*$mad")
    }
    // completeness: recount outliers naively
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val med = ev.groupBy(_._2).map { case (t, vs) =>
      val s = vs.map(_._3).sorted; t -> s((s.length + 1) / 2 - 1) }
    val mad = ev.groupBy(_._2).map { case (t, vs) =>
      val s = vs.map(v => math.abs(v._3 - med(t))).sorted; t -> s((s.length + 1) / 2 - 1) }
    val expected = ev.filter { case (_, t, v) => math.abs(v - med(t)) > 3.0 * mad(t) }.map(_._1).toSet
    assert(rows.map(_._1).toSet == expected)
  }
}
