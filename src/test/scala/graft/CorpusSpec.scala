package graft

import org.apache.spark.sql.functions._

import graft.dedup.Corpus

class CorpusSpec extends SparkSpec {

  private def md5p60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(d.take(15), 16)
  }

  test("every corpus query runs, has rows, and a matching oracle") {
    Corpus.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
      assert(Corpus.oracles.contains(name), s"$name missing oracle SQL")
    }
  }

  test("corpus_sample selects exactly the md5-threshold set (exact replay)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val thr = Map("en" -> (1L << 60) / 4, "de" -> (1L << 60) / 2)
    val expected = docs.filter { case (id, lang) =>
      md5p60(id.toString) < thr.getOrElse(lang, 1L << 60)
    }.map(_._1).toSet
    val got = Corpus.corpusSample(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(got == expected,
      s"sample mismatch: extra=${got.diff(expected)}, missing=${expected.diff(got)}")
    // strata actually differ: en is downsampled, the tail is kept whole
    val keptByLang = Corpus.corpusSample(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalByLang = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(keptByLang("en") < totalByLang("en"), "en stratum was not downsampled")
  }

  test("corpus_sample is a pure function of the input (rerun-identical)") {
    val a = Corpus.corpusSample(spark, sf).collect().toSet
    val b = Corpus.corpusSample(spark, sf).collect().toSet
    assert(a == b)
  }

  test("stratifiedSample on an arbitrary frame: rate 0 drops all, full rate keeps all") {
    val sess = spark
    import sess.implicits._
    val df = (1L to 200L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "grp")
    val kept = Corpus.stratifiedSample(df, "grp", col("id"),
      rateNums = Seq("a" -> 0L), defaultNum = 1L << 60)
    val got = kept.select("grp").distinct().collect().map(_.getString(0)).toSet
    assert(got == Set("b"), s"rate-0 stratum leaked: $got")
    assert(kept.count() == 100L, "full-rate stratum must keep every row")
  }

  test("stratifiedSample fails loudly on duplicate keys and out-of-range rates") {
    val sess = spark
    import sess.implicits._
    val df = (1L to 10L).map(i => (i, "a")).toDF("id", "grp")
    intercept[IllegalArgumentException] {
      Corpus.stratifiedSample(df, "grp", col("id"),
        rateNums = Seq("a" -> 1L, "a" -> 2L), defaultNum = 1L)
    }
    intercept[IllegalArgumentException] {
      Corpus.stratifiedSample(df, "grp", col("id"),
        rateNums = Seq("a" -> -1L), defaultNum = 1L)
    }
    intercept[IllegalArgumentException] {
      Corpus.stratifiedSample(df, "grp", col("id"),
        rateNums = Seq("a" -> 1L), defaultNum = (1L << 60) + 1L)
    }
  }

  test("corpus_shuffle: each epoch is a full permutation, epochs differ, batches are full-sized") {
    val rows = Corpus.corpusShuffle(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == Set(1, 2))
    byEpoch.foreach { case (e, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (0L until n), s"epoch $e global_idx not a permutation")
      // every batch but the last is exactly full
      rs.groupBy(_._4).foreach { case (b, bs) =>
        if (b < (n - 1) / 64) assert(bs.length == 64, s"epoch $e batch $b has ${bs.length}")
      }
    }
    // the two epochs order the corpus differently
    val o1 = byEpoch(1).sortBy(_._3).map(_._2).toSeq
    val o2 = byEpoch(2).sortBy(_._3).map(_._2).toSeq
    assert(o1 != o2, "epoch permutations identical — shuffle key ignores the epoch")
  }

  test("corpus_pack places every doc where its token window starts") {
    val budget = 2000L
    val rows = Corpus.corpusPack(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("shard_idx"), r.getAs[String]("shard")))
    assert(rows.length == spark.read.parquet(s"$sf/documents.parquet").count())
    rows.groupBy(_._2).foreach { case (lang, docs) =>
      var cum = 0L
      docs.sortBy(_._1).foreach { case (id, _, n, shardIdx, shard) =>
        assert(shardIdx == cum / budget, s"doc $id: shard $shardIdx != ${cum / budget}")
        assert(shard == s"$lang-$shardIdx")
        cum += n
      }
      // greedy contract: shard indexes are contiguous from 0
      val idxs = docs.map(_._4).distinct.sorted.toSeq
      assert(idxs == (0L until idxs.length.toLong),
        s"non-contiguous shards in $lang: $idxs")
    }
  }

  test("corpus_filter verdicts agree with the component operators") {
    import graft.dedup.{Dedup, Text}
    val got = Corpus.corpusFilter(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got.size == spark.read.parquet(s"$sf/documents.parquet").count())
    val qOk = Text.textQuality(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    val repOk = Text.textRepetition(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    val contaminated = Text.textContamination(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    got.foreach { case (id, r) =>
      assert(r.getAs[Boolean]("q_ok") == qOk(id))
      assert(r.getAs[Boolean]("rep_ok") == repOk.getOrElse(id, false))
      assert(r.getAs[Boolean]("contaminated") == contaminated.contains(id))
      val keep = r.getAs[Boolean]("keep")
      val reason = r.getAs[String]("reason")
      assert(keep == (reason == "ok"), s"doc $id: keep=$keep but reason=$reason")
      if (keep) assert(r.getAs[Boolean]("lang_ok") && r.getAs[Boolean]("is_canonical"))
    }
    // the pipeline actually cuts something and keeps something
    val kept = got.values.count(_.getAs[Boolean]("keep"))
    assert(kept > 0 && kept < got.size)
  }

  test("corpus_pack's doc-level window is bucketed — no data-sized per-language task") {
    // the low-cardinality-serializer guard (SURVEY §5): the window that
    // orders DOCS (by doc_id) must partition on (lang, bkt) so no task
    // sorts a whole language; the only lang-alone window orders the
    // per-bucket census (by bkt), which is n/B rows
    val plan = Corpus.corpusPack(spark, sf).queryExecution.executedPlan.toString
    val winLines = plan.linesIterator.filter(_.contains("Window ")).toSeq
    assert(winLines.size >= 2, s"expected the two-level prefix sum, got:\n$plan")
    winLines.filter(_.contains("doc_id")).foreach { l =>
      assert(l.contains("bkt"), s"doc-level window not bucketed:\n$l")
    }
  }

  test("corpus_mix enforces the census-derived caps exactly") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val total = docs.length.toLong
    val cnt = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val caps = Map("en" -> (1L, 4L), "es" -> (1L, 10L))
    // exact-rational replay with BigInt (the spec's independent engine)
    val expected = docs.filter { case (id, lang) =>
      val (num, den) = caps.getOrElse(lang, (1L, 1L))
      BigInt(md5p60(id.toString)) * den * cnt(lang) < BigInt(num) * total * (BigInt(1) << 60)
    }.map(_._1).toSet
    val got = Corpus.corpusMix(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(got == expected,
      s"mix mismatch: extra=${got.diff(expected)}, missing=${expected.diff(got)}")
    // the caps bind: en exceeds 25% of the corpus originally, so it is
    // cut; uncapped languages are kept whole
    val keptByLang = got.toSeq.map(id => docs.find(_._1 == id).get._2)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(keptByLang("en") < cnt("en"), "en cap did not bind")
    assert(keptByLang("de") == cnt("de"), "uncapped language must be kept whole")
  }

  test("corpus_pack shards overflow by at most one document") {
    val budget = 2000L
    val byShard = Corpus.corpusPack(spark, sf).collect()
      .map(r => (r.getAs[String]("shard"), r.getAs[Long]("n_tokens")))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    byShard.foreach { case (shard, toks) =>
      assert(toks.sum - toks.max < budget,
        s"$shard holds ${toks.sum} tokens; removing its largest doc still exceeds $budget")
    }
  }

  test("corpus_stats: census invariants against an independent driver-side replay") {
    val rows = Corpus.corpusStats(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // exact integer columns replayed in plain JVM
    val byCell = docs.groupBy(t => (t._1, t._2))
    assert(rows.length == byCell.size)
    val totalToks = docs.map(_._3.split(" ", -1).length.toLong).sum
    var shareSum = 0.0
    rows.foreach { r =>
      val cell = byCell((r.getString(0), r.getString(1)))
      assert(r.getLong(r.fieldIndex("n_docs")) == cell.length)
      assert(r.getLong(r.fieldIndex("n_ws_tokens")) ==
        cell.map(_._3.split(" ", -1).length.toLong).sum)
      assert(r.getLong(r.fieldIndex("n_chars")) == cell.map(_._3.length.toLong).sum)
      assert(r.getLong(r.fieldIndex("n_unique_texts")) == cell.map(_._3).distinct.length)
      assert(r.getLong(r.fieldIndex("n_unique_texts")) <= r.getLong(r.fieldIndex("n_docs")))
      assert(math.abs(r.getDouble(r.fieldIndex("token_share")) -
        cell.map(_._3.split(" ", -1).length.toLong).sum.toDouble / totalToks) < 1e-12)
      shareSum += r.getDouble(r.fieldIndex("token_share"))
    }
    assert(math.abs(shareSum - 1.0) < 1e-9, s"shares sum to $shareSum")
  }
}
