package graft

import org.apache.spark.sql.functions._

import graft.queries.Events

class EventsSpec extends SparkSpec {

  test("every event-analytics query runs, has rows, and a matching oracle") {
    Events.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
      assert(Events.oracles.contains(name), s"$name missing oracle SQL")
    }
  }

  test("q_funnel: step times strictly ordered, reach counts form a funnel") {
    val rows = Events.qFunnel(spark, sf).collect()
    rows.foreach { r =>
      val (tv, tc, tp) = (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))
      val reached = r.getInt(4)
      // a step can only exist if the previous did, and strictly later
      assert(tc.isEmpty || tv.nonEmpty); assert(tp.isEmpty || tc.nonEmpty)
      (tv, tc) match { case (Some(a: Long), Some(b: Long)) => assert(b > a); case _ => }
      (tc, tp) match { case (Some(a: Long), Some(b: Long)) => assert(b > a); case _ => }
      assert(reached == Seq(tv, tc, tp).count(_.nonEmpty))
    }
    val n = (0 to 3).map(k => rows.count(_.getInt(4) >= k))
    assert(n == n.sorted.reverse, s"reach counts not monotone: $n")
    assert(rows.exists(_.getInt(4) == 3), "nobody converted — funnel degenerate")
  }

  test("q_retention: offset-0 cell is the cohort size and bounds later offsets") {
    val rows = Events.qRetention(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cohort, cells) =>
      val byOffset = cells.map(c => c._2 -> c._3).toMap
      assert(byOffset.contains(0L), s"cohort $cohort missing offset 0")
      byOffset.foreach { case (off, n) =>
        assert(off >= 0 && n <= byOffset(0L), s"cohort $cohort offset $off exceeds cohort size")
      }
    }
  }

  test("q_gap_fill: dense axis, counts conserved, gaps zero-filled") {
    val rows = Events.qGapFill(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    val hours = rows.map(_._1)
    val types = rows.map(_._2).distinct
    assert(rows.length == (hours.max - hours.min + 1) * types.length, "axis not dense")
    val total = graft.sources.Tables.events(spark, sf).count()
    assert(rows.map(_._3).sum == total, "event counts not conserved by the fill")
    rows.foreach { case (_, _, n, gap) => assert(gap == (n == 0L)) }
    assert(rows.exists(_._4), "no gaps at test scale — flag untested")
  }
}
