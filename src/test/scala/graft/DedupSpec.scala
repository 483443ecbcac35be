package graft

import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, Multimodal, Text}
import graft.streaming.Streaming

class DedupSpec extends SparkSpec {

  test("every dedup/text/mm/stream query runs and has rows") {
    val all = Dedup.queries ++ Text.queries ++ Multimodal.queries ++ Streaming.queries
    all.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("dedup_exact keeps every doc exactly once when no dups") {
    val n = Dedup.dedupExact(spark, sf).agg(sum("n_copies")).first().getLong(0)
    assert(n == spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("ngram jaccard pairs are the planted near-dups (sim in [0.5, 1])") {
    val rows = Dedup.dedupNgramJaccard(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.5 && j <= 1.0)
    }
  }

  test("minhash-lsh candidates cover high-jaccard pairs") {
    val exact = Dedup.dedupNgramJaccard(spark, sf)
      .filter(col("jaccard") >= 0.8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.dedupMinhashLsh(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // r=2 bands: P(miss a 0.8-jaccard pair) = (1-0.64)^32 ≈ 6e-15
    assert(exact.subsetOf(cand), s"LSH missed ${exact.diff(cand)}")
  }

  test("topk bruteforce: 5 neighbors per query, descending") {
    val rows = Dedup.simTopkBruteforce(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q"))
    assert(byQ.size == 10)
    byQ.values.foreach { rs =>
      assert(rs.length == 5)
      val sims = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("cosine"))
      assert(sims.zip(sims.tail).forall { case (x, y) => x >= y })
    }
  }

  test("ann-lsh neighbors are a subset of each query's bucket, ranked") {
    val rows = graft.dedup.Dedup.simAnnLsh(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q")).values.foreach(rs => assert(rs.length <= 5))
  }

  test("langid prediction is deterministic and scores are consistent") {
    val rows = Text.textLangid(spark, sf).collect()
    rows.foreach { r =>
      val scores = Seq("s_en", "s_de", "s_es", "s_fr").map(c => r.getAs[Int](c))
      val pred = r.getAs[String]("pred_lang")
      if (scores.forall(_ == 0)) assert(pred == "und")
      else assert(scores.max == r.getAs[Int](s"s_$pred"))
    }
  }

  test("mm_meta: deterministic features, one row per doc") {
    val a = Multimodal.mmMeta(spark, sf).orderBy("doc_id").collect()
    val b = Multimodal.mmMeta(spark, sf).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    assert(a.length == spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("stream window agg equals batch computation") {
    val streamed = Streaming.streamWindowAgg(spark, sf)
      .select("wstart", "event_type", "n_events")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val batch = graft.sources.Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss"), col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }
}
