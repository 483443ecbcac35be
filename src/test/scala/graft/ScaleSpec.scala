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

  test("dedup_incremental's own probe reads the persisted store with no store-side exchange") {
    // not a mock-up: this asserts on the exact candidate frame the
    // query consumes. The historical LSH band keys are PERSISTED
    // bucketed+sorted on `key` (the store's join contract — the band
    // index is embedded in the key's md5 preimage), so each ingest
    // batch's probe shuffles only the (batch-sized) probe side — the
    // corpus-sized store never moves.
    import graft.dedup.Dedup
    val batchSh = Dedup.shingles(spark, sf).filter(col("doc_id") % 5 === 0)
    val cand = Dedup.incrementalCandidates(spark, sf, batchSh)
    val plan = cand.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(plan.contains("Bucketed: true"), s"store scan must use its buckets:\n$plan")
    // the only exchanges are the probe's own: its signature groupBy
    // and its co-partitioning to the store's buckets — the store side
    // reads straight into the join. (Round 13: the shingle frame is a
    // memoized checkpoint, so the Scale.fanScan repartition that used
    // to be the probe's third exchange now lives inside the
    // checkpoint's one-time materialization, not in this plan.)
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 2, s"store side must not shuffle (probe pays 2), got $exchanges:\n$plan")
    // the store scan feeds its join-side Sort directly: no Exchange may
    // sit between the last pre-store Sort and the bucketed FileScan
    val storeScanAt = plan.indexOf("FileScan parquet spark_catalog.default.graft_sigstore")
    val storeSortAt = plan.lastIndexOf("Sort [key", storeScanAt)
    assert(storeSortAt >= 0 && !plan.substring(storeSortAt, storeScanAt).contains("Exchange"),
      s"exchange appeared on the store side:\n$plan")
    assert(cand.count() > 0)
    // the full query built on this path still answers: every batch doc
    // verdicts once
    val out = Dedup.dedupIncremental(spark, sf)
    val nBatch = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 5 === 0).count()
    assert(out.count() == nBatch)
    Dedup.resetStores()
  }

  test("co-bucketed statement/qualifier layout joins with no exchange") {
    // the serving layout behind the Wikibase statement layer (SURVEY
    // §3): qualifier reads are recurring statement-qualifier joins on
    // sid, and BOTH relations grow with the graph — so the production
    // store writes them co-bucketed on sid and the join moves nothing
    import graft.kg.Wikibase
    Scale.writeBucketed(Wikibase.qualifiedStatements(spark, sf), "b_qstmt", "sid", 8)
    Scale.writeBucketed(Wikibase.qualifiers(spark, sf), "b_quals", "sid", 8)
    val joined = Scale.colocatedJoin(spark, "b_qstmt", "b_quals", "sid")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(!plan.contains("Exchange"), s"qualifier join must not shuffle:\n$plan")
    val expected = Wikibase.qualifiedStatements(spark, sf)
      .join(Wikibase.qualifiers(spark, sf), "sid").count()
    assert(joined.count() == expected)
  }

  test("q_incremental_agg merges into the persisted view with no store-side exchange") {
    // the view is bucketed+sorted on o_custkey and the BATCH shuffles
    // to the view's layout — the full-outer merge must read the store
    // straight from its buckets (one exchange total, on the batch side)
    import graft.queries.Incremental
    val merged = Incremental.qIncrementalAgg(spark, sf)
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"),
      s"expected full-outer SMJ in:\n$plan")
    assert(plan.contains("Bucketed: true"), s"view scan must use its buckets:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"only the batch side may shuffle, got $exchanges:\n$plan")
    assert(merged.count() > 0)
    Incremental.resetStores()
  }

  test("er_incremental's exact probe reads the persisted registry with no store-side exchange") {
    // same contract as the dedup signature store: the registry is
    // bucketed+sorted on `norm` (the exact probe's join key), so each
    // ingest batch's probe shuffles only the batch side
    import graft.er.ER
    val t = ER.registryTable(spark, sf)
    val batch = spark.read.parquet(s"$sf/part.parquet")
      .filter(col("p_partkey") % 5 === 0)
      .select(col("p_partkey").as("id"), ER.norm(col("p_name")).as("norm"))
    val probe = batch.join(spark.table(t).hint("merge"), Seq("norm"))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(plan.contains("Bucketed: true"), s"registry scan must use its buckets:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"only the batch side may shuffle, got $exchanges:\n$plan")
    assert(probe.count() > 0)
    ER.resetMemo()
  }

  test("salted join is result-identical to the plain join") {
    val l = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey", "l_quantity")
    val n = Tables.orders(spark, sf).select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = l.join(n, "l_orderkey")
    val salted = Scale.saltedJoin(l, n, "l_orderkey", 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("fillDown: distributed LOCF equals the single-partition window on every boundary shape") {
    import org.apache.spark.sql.expressions.Window
    val sess = spark; import sess.implicits._
    // 100 ordered rows; value present on a sparse, irregular set so
    // carries must cross partition boundaries; leading rows null so
    // the stay-null-before-first-value case is exercised
    val df = (1 to 100).map { i =>
      (i, if (i >= 7 && (i % 13 == 0 || i % 31 == 5)) s"v$i" else null)
    }.toDF("k", "v")
    val w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("v", last(col("v"), ignoreNulls = true).over(w))
      .collect().map(r => (r.getInt(0), r.getAs[String]("v"))).toMap
    // 7 partitions forces ~14-row slices: several all-null partitions
    // inherit their carry from 2+ partitions upstream
    for (parts <- Seq(1, 7, 32)) {
      val got = Scale.fillDown(df, Seq(col("k")), "v", partitions = parts)
        .collect().map(r => (r.getInt(0), r.getAs[String]("v"))).toMap
      assert(got == expected, s"fillDown($parts partitions) diverges from the window LOCF")
    }
    assert(expected(6) == null && expected(100) != null)
  }
}
