package graft

import org.apache.spark.sql.functions._

import graft.kg.GraphMetrics

class GraphMetricsSpec extends SparkSpec {

  test("every graph-metric query runs, has rows, and a matching oracle") {
    GraphMetrics.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
      assert(GraphMetrics.oracles.contains(name), s"$name missing oracle SQL")
    }
  }

  test("kg_path_alt covers all three path forms and arms are disjoint") {
    val df = GraphMetrics.kgPathAlt(spark, sf)
    val forms = df.select("form").distinct().collect().map(_.getString(0)).toSet
    assert(forms == Set("alt_direct", "alt_inverse", "neg_set"))
    // the negated set truly excludes the negated predicates
    val negPs = df.filter(col("form") === "neg_set")
      .select("p").distinct().collect().map(_.getString(0)).toSet
    assert(negPs.nonEmpty && !negPs.contains("in_nation") && !negPs.contains("label"))
  }

  test("kg_clustering_coeff is a valid rational in [0, 1] with exact invariants") {
    val rows = GraphMetrics.kgClusteringCoeff(spark, sf)
      .select("node", "n_triangles", "degree", "coeff_num", "coeff_den").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tri, deg, num, den) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(num == 2 * tri && den == deg * (deg - 1))
      if (den > 0) assert(num <= den, s"coefficient > 1 at node ${r.getLong(0)}")
      else assert(tri == 0, "a degree-1 node cannot close a triangle")
    }
    assert(rows.exists(_.getLong(3) > 0), "no triangles found — graph too sparse to test")
  }

  test("kg_random_walk walks are complete, edge-valid, and deterministic") {
    val walks = GraphMetrics.kgRandomWalk(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byStart = walks.groupBy(_._1)
    // every start node carries a full-length walk
    byStart.foreach { case (s, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (0 to 3), s"walk from $s incomplete")
      assert(rows.find(_._2 == 0).get._3 == s, "step 0 must be the start node")
    }
    // every consecutive hop is a real co-occurrence edge
    val edgeSet = graft.kg.KGQueries.kgCooccur(spark, sf)
      .collect().flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0)))).toSet
    byStart.foreach { case (s, rows) =>
      rows.sortBy(_._2).map(_._3).sliding(2).foreach {
        case Array(a, b) => assert(edgeSet.contains((a, b)), s"walk from $s jumped $a->$b (not an edge)")
        case _           =>
      }
    }
    // md5-driven: rerun is bit-identical
    val rerun = GraphMetrics.kgRandomWalk(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(walks.toSet == rerun.toSet)
  }

  test("kg_having keeps only above-average nations, and excludes at least one") {
    val rows = GraphMetrics.kgHaving(spark, sf).collect()
    assert(rows.nonEmpty)
    val avg = rows.head.getDouble(3)
    rows.foreach(r => assert(r.getLong(2).toDouble > avg))
    val nNations = spark.read.parquet(s"$sf/nation.parquet").count()
    assert(rows.length < nNations, "HAVING filtered nothing — threshold degenerate")
  }

  test("kg_node_sim jaccard is exact, bounded, and symmetric in its inputs") {
    val rows = GraphMetrics.kgNodeSim(spark, sf)
      .select("a", "b", "common", "deg_a", "deg_b", "union_size").collect()
    assert(rows.nonEmpty && rows.length <= 100)
    rows.foreach { r =>
      val (a, b, common, da, db, u) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(a < b, "pair not canonically oriented")
      assert(u == da + db - common)
      assert(common >= 1 && common <= math.min(da, db), s"common $common outside [1, min($da,$db)]")
    }
  }

  test("kg_communities equals an in-memory synchronous LPA replay") {
    val got = GraphMetrics.kgCommunities(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // independent replay: 4 rounds of sync label propagation with the
    // most-frequent-then-smallest tie-break, over the same weight>=2
    // co-occurrence edges
    val edges = graft.kg.KGQueries.kgCooccur(spark, sf)
      .select("p1", "p2").collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    var lbl: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    (1 to 4).foreach { _ =>
      lbl = adj.map { case (n, nbrs) =>
        val counts = nbrs.groupBy(lbl).map { case (l, xs) => (l, xs.size) }
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val sizes = lbl.values.groupBy(identity).map { case (l, xs) => l -> xs.size.toLong }
    val exp = lbl.map { case (n, l) => (n, l, sizes(l)) }.toSet
    assert(got.length == adj.size && got.toSet == exp,
      s"LPA diverges: ${got.toSet.diff(exp).take(3)} vs ${exp.diff(got.toSet).take(3)}")
    // communities actually merge: fewer labels than nodes
    assert(sizes.size < adj.size, "no label propagated — graph or tie-break suspect")
  }

  test("kcore: every core node has >= k core neighbors; removed nodes justify removal") {
    val k = 3
    val got = graft.kg.GraphMetrics.kgKcore(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val edges = graft.kg.KGQueries.kgCooccur(spark, sf)
      .select("p1", "p2").collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    assert(got.keySet == adj.keySet, "one verdict per co-occurrence node")
    val core = got.collect { case (n, true) => n }.toSet
    // soundness: the k-core property holds inside the core
    core.foreach { n =>
      val inCore = adj(n).count(core)
      assert(inCore >= k, s"core node $n has only $inCore core neighbors")
    }
    // maximality: re-running one peel round over core + removed set
    // readmits nobody (an in-memory replay of the fixpoint condition)
    var s2 = adj.keySet
    var stable = false
    while (!stable) {
      val next = s2.filter(n => adj(n).count(s2) >= k)
      stable = next == s2; s2 = next
    }
    assert(s2 == core, s"fixpoint drift: ${(s2 diff core).take(3)} / ${(core diff s2).take(3)}")
    // sf0.001's co-occurrence graph is dense (min degree 5), so the
    // 3-core keeps every node — the all-true verdict IS the correct
    // answer here; the sf0.01 oracle gate exercises the split (min
    // degree 1 there)
    assert(core.nonEmpty, "3-core unexpectedly empty on the dense test graph")
  }

  test("edge betweenness matches in-memory exact Brandes at 1e-6") {
    val raw = graft.kg.GraphMetrics.kgEdgeBetweenness(spark, sf).collect()
    // the display double is exactly the integer score over 2S — ONE
    // IEEE division from an exact Int64 (the kg_pagerank convention)
    raw.foreach { r =>
      val s2 = r.getAs[Long]("bw_scaled_x2")
      assert(r.getAs[Double]("betweenness") ==
        s2.toDouble / (2.0 * graft.kg.GraphMetrics.BwScale),
        s"display column drifted from the exact integer at $s2")
    }
    val got = raw
      .map(r => ((r.getAs[Long]("a"), r.getAs[Long]("b")),
        r.getAs[Double]("betweenness"))).toMap
    val w = graft.kg.GraphMetrics.kgWithinRelations(spark, sf)
      .select("root", "item1").collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = w.map { case (x, y) => (math.min(x, y), math.max(x, y)) }.distinct
    assert(und.nonEmpty, "induced analysis graph must be non-trivial")
    val adj = (und ++ und.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
      .withDefaultValue(Seq.empty)
    val nodes = adj.keys.toSeq
    val eb = collection.mutable.Map[(Long, Long), Double]().withDefaultValue(0.0)
    for (s <- nodes) {
      val dist = collection.mutable.Map[Long, Int](s -> 0)
      val sigma = collection.mutable.Map[Long, Double](s -> 1.0).withDefaultValue(0.0)
      val order = collection.mutable.ArrayBuffer[Long](s)
      val queue = collection.mutable.Queue[Long](s)
      val preds = collection.mutable.Map[Long, List[Long]]().withDefaultValue(Nil)
      while (queue.nonEmpty) {
        val v = queue.dequeue()
        for (wn <- adj(v)) {
          if (!dist.contains(wn)) { dist(wn) = dist(v) + 1; queue += wn; order += wn }
          if (dist(wn) == dist(v) + 1) { sigma(wn) += sigma(v); preds(wn) ::= v }
        }
      }
      val delta = collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
      for (wn <- order.reverse; v <- preds(wn)) {
        val c = sigma(v) / sigma(wn) * (1.0 + delta(wn))
        eb((math.min(v, wn), math.max(v, wn))) += c / 2.0
        delta(v) += c
      }
    }
    assert(got.keySet == eb.keySet,
      s"edge sets differ: ${(got.keySet diff eb.keySet).take(3)} / ${(eb.keySet diff got.keySet).take(3)}")
    got.foreach { case (k, v) =>
      assert(math.abs(v - eb(k)) < 1e-6, s"$k: distributed $v vs exact ${eb(k)}") }
    // sanity: scores are positive and not all equal (the ranking the
    // reference's arrange(desc(centrality)) depends on)
    assert(got.values.forall(_ > 0))
    assert(got.values.toSet.size > 1, "all-equal scores cannot rank edges")
  }

  test("kg_sp_census equals in-memory all-sources BFS (dist and sigma exact)") {
    // integer ground truth, == not tolerance: the census is the
    // oracle-gated half of Brandes
    val w = graft.kg.GraphMetrics.kgWithinRelations(spark, sf)
      .select("root", "item1").collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = w.map { case (x, y) => (math.min(x, y), math.max(x, y)) }.distinct
    val adj = (und ++ und.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
      .withDefaultValue(Seq.empty)
    val expected = collection.mutable.Map[(Long, Long), (Int, Long)]()
    for (s <- adj.keys.toSeq) {
      val dist = collection.mutable.Map[Long, Int](s -> 0)
      val sigma = collection.mutable.Map[Long, Long](s -> 1L).withDefaultValue(0L)
      val queue = collection.mutable.Queue[Long](s)
      while (queue.nonEmpty) {
        val v = queue.dequeue()
        for (n <- adj(v)) {
          if (!dist.contains(n)) { dist(n) = dist(v) + 1; queue += n }
          if (dist(n) == dist(v) + 1) sigma(n) += sigma(v)
        }
      }
      dist.foreach { case (n, d) => expected((s, n)) = (d, sigma(n)) }
    }
    val got = graft.kg.GraphMetrics.kgSpCensus(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getInt(2), r.getLong(3)))).toMap
    assert(got == expected.toMap,
      s"census differs: ${(got.toSet diff expected.toSet).take(3)} vs ${(expected.toSet diff got.toSet).take(3)}")
  }
}
