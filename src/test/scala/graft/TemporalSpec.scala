package graft

import org.apache.spark.sql.functions._

import graft.queries.Temporal
import graft.sources.Tables

class TemporalSpec extends SparkSpec {

  test("every temporal query runs, has rows, and a matching oracle") {
    Temporal.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
      assert(Temporal.oracles.contains(name), s"$name missing oracle SQL")
    }
  }

  test("q_asof_join matches the naive join+argmax semantics") {
    // independent implementation: join every (purchase, prior
    // interaction) pair, keep the (max ts, max event_id) one — the
    // O(n·m) definition the union-window plan must reproduce
    val ev = Tables.events(spark, sf)
    val src = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id").as("su"), col("ts").as("s_ts"),
        col("event_id").as("s_id"), col("event_type").as("s_type"))
    val buy = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val naive = buy
      .join(src, col("su") === col("user_id") && col("s_ts") <= col("ts"), "left_outer")
      .groupBy(col("purchase_id"))
      .agg(max(struct(col("s_ts"), col("s_id"), col("s_type"))).as("best"))
      .select(col("purchase_id"), col("best.s_id").as("attr_event_id"),
        col("best.s_type").as("attr_event_type"),
        date_format(col("best.s_ts"), "yyyy-MM-dd HH:mm:ss").as("attr_ts"))
    val got = Temporal.qAsofJoin(spark, sf)
      .select(col("purchase_id"), col("attr_event_id"), col("attr_event_type"), col("attr_ts"))
    assert(got.count() == buy.count(), "one output row per purchase")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
      "union-window as-of != naive join+argmax")
  }

  test("q_asof_join attributes most purchases and nulls the rest") {
    val got = Temporal.qAsofJoin(spark, sf)
    assert(got.filter(col("attr_event_id").isNotNull).count() > 0,
      "no purchase was attributed at all")
    // attribution is never to a later event
    assert(got.filter(col("attr_ts") > col("purchase_ts")).count() == 0)
  }

  test("q_range_join matches the plain equi-join + range filter") {
    val ev = Tables.events(spark, sf)
    val probe = ev.select(col("user_id").as("pu"), col("ts").as("p_ts"))
    val naive = ev.filter(col("event_type") === "signup")
      .join(probe, col("pu") === col("user_id")
        && unix_micros(col("p_ts")) >= unix_micros(col("ts"))
        && unix_micros(col("p_ts")) < unix_micros(col("ts")) + lit(86400000000L))
      .groupBy(col("event_id").as("signup_id"))
      .agg(count(lit(1)).as("n_events"))
    val got = Temporal.qRangeJoin(spark, sf).select(col("signup_id"), col("n_events"))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
      "banded range join != naive range join")
  }

  test("q_range_join emits one row per signup, each window has the signup itself") {
    val got = Temporal.qRangeJoin(spark, sf)
    val signups = Tables.events(spark, sf).filter(col("event_type") === "signup").count()
    assert(got.count() == signups)
    assert(got.filter(col("n_events") < 1).count() == 0)
  }

  test("asofJoin equals the naive definition on random tie-heavy data") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val sess = spark
    import sess.implicits._
    // tiny key/time domains force the edge cases the real data rarely
    // hits: equal-time ties (build-build and build-probe), keys with
    // no build rows, keys with no probe rows, empty sides
    val gen = for {
      nb <- Gen.choose(0, 25)
      np <- Gen.choose(1, 25)
      build <- Gen.listOfN(nb, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 6L)))
      probe <- Gen.listOfN(np, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 6L)))
    } yield (build.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) },
      probe.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) })
    val prop = Prop.forAllNoShrink(gen) { case (build, probe) =>
      val b = build.toDF("k", "t", "bid")
      val p = probe.toDF("k", "t", "pid")
      val got = Temporal.asofJoin(p, b, key = "k", time = "t", payload = Seq("bid"))
        .collect().map(r => (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long])))
        .toSet
      val expected = probe.map { case (k, t, pid) =>
        val eligible = build.filter { case (bk, bt, _) => bk == k && bt <= t }
        (pid, if (eligible.isEmpty) None
              else Some(eligible.map { case (_, bt, bid) => (bt, bid) }.max._2))
      }.toSet
      got == expected
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15).withInitialSeed(7L), prop)
    assert(result.passed, s"property failed: ${result.status}")
  }

  test("asofJoin rejects payload names colliding with probe columns") {
    val sess = spark
    import sess.implicits._
    val b = Seq((1L, 1L, 9L)).toDF("k", "t", "pid") // 'pid' collides
    val p = Seq((1L, 2L, 7L)).toDF("k", "t", "pid")
    val msg = intercept[IllegalArgumentException](
      Temporal.asofJoin(p, b, key = "k", time = "t", payload = Seq("pid"))).getMessage
    assert(msg.contains("collide"))
  }

  test("bandedRangeJoin equals the naive definition on random data (incl. negative times)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val sess = spark
    import sess.implicits._
    val day = 86400000000L
    // times straddle zero and day boundaries: SQL div truncates toward
    // zero (not floor), which is safe because div is monotonic — this
    // generator would catch any misuse of that property
    val genT = Gen.choose(-3L * day, 3L * day)
    val gen = for {
      na <- Gen.choose(0, 15)
      np <- Gen.choose(0, 25)
      anchors <- Gen.listOfN(na, Gen.zip(Gen.choose(0L, 2L), genT))
      probes <- Gen.listOfN(np, Gen.zip(Gen.choose(0L, 2L), genT))
      win <- Gen.oneOf(1L, day / 2, day, 2L * day + 12345L)
    } yield (anchors.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
      probes.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }, win)
    val prop = Prop.forAllNoShrink(gen) { case (anchors, probes, win) =>
      val a = anchors.toDF("aid", "k", "t")
      val p = probes.toDF("k", "t", "pid")
      val got = Temporal.bandedRangeJoin(a, p, key = "k", time = "t", windowUs = win)
        .select("aid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (for {
        (aid, ak, at) <- anchors
        (pk, pt, pid) <- probes
        if pk == ak && pt >= at && pt < at + win
      } yield (aid, pid)).toSet
      got == expected
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15).withInitialSeed(11L), prop)
    assert(result.passed, s"property failed: ${result.status}")
  }

  test("q_range_join plan is an equi-join, not a nested-loop join") {
    val plan = Temporal.qRangeJoin(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$plan")
  }

  test("q_asof_join plan shuffles once on the user key (no join node)") {
    val plan = Temporal.qAsofJoin(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of should be union+window, found a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly one hash exchange, got $exchanges:\n$plan")
  }
}
