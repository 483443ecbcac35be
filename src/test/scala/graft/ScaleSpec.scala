package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.util.Scale

class ScaleSpec extends SparkSpec {

  test("bucketed tables join with NO exchange (co-located SMJ)") {
    Scale.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice"),
      "b_orders", "o_orderkey", 8)
    Scale.writeBucketed(
      Tables.lineitem(spark, sf).select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "b_lineitem", "o_orderkey", 8)
    val joined = Scale.colocatedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() == spark.read.parquet(s"$sf/lineitem.parquet").count())
  }

  test("bucketed edge layout serves BFS hops with no exchange on the edge side") {
    // the production shape kgKhop's scaladoc prescribes: recurring
    // k-hop expansions read edges bucketed by source, so each hop's
    // join shuffles ONLY the (tiny) frontier — the 100 TB edge set
    // never moves
    val store = graft.kg.TripleStore(spark, graft.kg.Triples.statements(spark, sf))
    Scale.writeBucketed(store.edges, "b_edges", "a", 8)
    val frontier = store.byLabel("ASIA").withColumnRenamed("node", "a")
    val hop = spark.table("b_edges").hint("merge").join(frontier, "a")
    val plan = hop.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly the frontier-side exchange, got $exchanges:\n$plan")
    // same rows as the lazy-edge hop
    val expected = store.edges.join(frontier, "a").count()
    assert(hop.count() == expected)
  }

  test("bucketed label layout serves the label service with no exchange") {
    // the production story behind kgLabelJoin / TripleStore.labeled
    // dropping their broadcast hints: the label relation grows with
    // the graph, so the hot label service stores BOTH sides bucketed
    // on the entity id — the recurring label join then runs with zero
    // exchange (nothing shuffles, nothing is driver-collected)
    val store = graft.kg.TripleStore(spark, graft.kg.Triples.statements(spark, sf))
    Scale.writeBucketed(store.labels, "b_labels", "id", 8)
    Scale.writeBucketed(
      store.pattern("placed_by").select(col("s").as("order_id"), col("o_id").as("id")),
      "b_placed", "id", 8)
    val joined = Scale.colocatedJoin(spark, "b_placed", "b_labels", "id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(!plan.contains("Exchange"), s"label join must not shuffle:\n$plan")
    assert(joined.count() == graft.kg.KGQueries.kgLabelJoin(spark, sf).count())
  }

  test("bucketed signature store serves incremental dedup with no store-side exchange") {
    // the production story behind dedup_incremental: the historical
    // LSH band keys are PERSISTED bucketed on the band key, so each
    // new ingest batch's probe shuffles only the (batch-sized) probe
    // side — the corpus-sized store never moves. The store's join
    // contract is `key` alone (the band index is embedded in the
    // key's md5 preimage, so equal keys imply equal bands); Spark's
    // co-partitioning requires the join keys to match the bucket
    // spec exactly.
    import graft.dedup.Dedup
    val sh = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, greatest(size(t)-2, 0)), i -> concat_ws(' ', element_at(t,i), element_at(t,i+1), element_at(t,i+2)))"))
        .as("s")).distinct()
    val keys = Dedup.bandKeys(sh)
    Scale.writeBucketed(keys.filter(col("doc_id") % 5 =!= 0), "b_sigstore", "key", 8)
    val probe = keys.filter(col("doc_id") % 5 === 0)
      .select(col("key"), col("doc_id").as("b"))
    val cand = spark.table("b_sigstore").hint("merge").join(probe, Seq("key"))
    val plan = cand.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(plan.contains("Bucketed: true"), s"store scan must use its buckets:\n$plan")
    // the only exchanges are the probe's own: its signature groupBy
    // and its co-partitioning to the store's buckets — the store side
    // reads straight into the join
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 2, s"store side must not shuffle (probe pays 2), got $exchanges:\n$plan")
    assert(cand.count() > 0)
  }

  test("salted join is result-identical to the plain join") {
    val l = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey", "l_quantity")
    val n = Tables.orders(spark, sf).select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = l.join(n, "l_orderkey")
    val salted = Scale.saltedJoin(l, n, "l_orderkey", 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
