package graft

import org.apache.spark.sql.functions._

import graft.kg.{Components, KGQueries, TripleStore}
import graft.util.Checkpoints

/** Checkpoint lifecycle: the fixpoint loops (closure / property path /
  * connected components) unpersist superseded round checkpoints, so a
  * long-running session issuing many closures keeps a bounded set of
  * live RDD blocks instead of accumulating one per round per call. */
class CheckpointsSpec extends SparkSpec {

  private def live: Int = spark.sparkContext.getPersistentRDDs.size

  test("repeated closure calls keep persistent RDD blocks bounded") {
    val store = TripleStore(spark, sf)
    def once(): Long = {
      val r = store.closure(Seq("in_nation", "in_region"))
      val n = r.count()
      Checkpoints.freeAll(r) // caller frees the result once consumed
      n
    }
    val first = once() // settle any lazy one-time state
    val baseline = live
    val counts = (1 to 4).map(_ => once())
    assert(counts.forall(_ == first))
    assert(live <= baseline,
      s"persistent RDD count grew across closures: $baseline -> $live")
  }

  test("repeated property-path and CC calls keep blocks bounded") {
    def path(): Unit = Checkpoints.freeAll(
      { val r = KGQueries.kgPropertyPath(spark, sf); r.count(); r })
    def cc(): Unit = {
      val st = TripleStore(spark, sf)
      val e = st.edges.filter(col("a") % 7 === 0)
      val r = Components.connectedComponents(e, e.select(col("a").as("id")).distinct())
      r.count()
      Checkpoints.freeAll(r) // frees the final fixpoint edge checkpoint
    }
    path(); cc()
    val baseline = live
    (1 to 3).foreach { _ => path(); cc() }
    assert(live <= baseline,
      s"persistent RDD count grew: $baseline -> $live")
  }

  test("repeated census/betweenness calls share one memoized sweep; resetMemo frees it") {
    import graft.kg.GraphMetrics
    GraphMetrics.resetMemo()
    val baseline0 = live
    val c1 = GraphMetrics.kgSpCensus(spark, sf).count()
    val afterFirst = live
    assert(afterFirst > baseline0, "first census must materialize the sweep")
    // second call and the betweenness consumer reuse the memo — no new
    // sweep checkpoints appear however many times either runs
    val c2 = GraphMetrics.kgSpCensus(spark, sf).count()
    assert(c1 == c2)
    assert(live == afterFirst, "second census call created new sweep blocks")
    val eb = GraphMetrics.kgEdgeBetweenness(spark, sf)
    eb.count()
    Checkpoints.freeAll(eb) // frees the per-call contrib checkpoints
    assert(live <= afterFirst,
      s"betweenness leaked per-call blocks: $afterFirst -> $live")
    GraphMetrics.resetMemo()
    assert(live <= baseline0,
      s"resetMemo left sweep blocks live: baseline $baseline0 -> $live")
  }

  test("freeAll skips memo-pinned leaves; unpin releases them") {
    val sess = spark; import sess.implicits._
    val memoCp = (1 to 50).toDF("x").localCheckpoint(eager = true)
    Checkpoints.pin(memoCp)
    val derived = memoCp.select((col("x") * 2).as("y")).localCheckpoint(eager = true)
    // the consumer convention: drain a derived result, freeAll it —
    // this must free the derived checkpoint but NOT the pinned memo
    Checkpoints.freeAll(derived.select(col("y") + 1))
    assert(memoCp.count() == 50, "pinned memo checkpoint must survive freeAll")
    // the round-10 footgun shape: freeAll over a plan READING the memo
    Checkpoints.freeAll(memoCp.select(col("x") * 3))
    assert(memoCp.count() == 50, "memo must survive freeAll through a derived reader")
    Checkpoints.unpin(memoCp)
    val before = live
    Checkpoints.free(memoCp)
    assert(live == before - 1, "unpinned memo checkpoint frees normally")
  }

  test("rdf import memo survives a consumer's freeAll; resetMemo still reclaims") {
    import graft.kg.Rdf
    Rdf.resetMemo()
    val imp = Rdf.kgImportTtl(spark, sf)
    val n = imp.count()
    // the documented consumer convention on a drained result
    Checkpoints.freeAll(imp)
    // the memoized lines must still be readable by the next import
    assert(Rdf.kgImportTtl(spark, sf).count() == n,
      "second import in the same session must reuse live memo blocks")
    Rdf.resetMemo()
  }

  test("free is a no-op on derived frames and only frees checkpoint roots") {
    val sess = spark; import sess.implicits._
    val cp = (1 to 100).toDF("x").localCheckpoint(eager = true)
    val before = live
    Checkpoints.free(cp.select(col("x") * 2)) // derived — must not free cp
    assert(live == before)
    assert(cp.count() == 100) // still readable
    Checkpoints.free(cp)
    assert(live == before - 1)
  }
}
