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
}
