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

  test("dedup_substring flags exactly the spans an in-memory scan finds duplicated") {
    // independent O(corpus) recomputation: every word 8-gram span of
    // every doc, duplicated = present in >= 2 distinct docs
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val expected = docs.flatMap { case (id, w) =>
        w.sliding(8).filter(_.length == 8).map(sp => (sp.mkString(" "), id))
      }
      .groupBy(_._1).view
      .mapValues(occ => (occ.map(_._2).distinct.length.toLong, occ.length.toLong, occ.map(_._2).min))
      .filter(_._2._1 >= 2)
    val got = Dedup.dedupSubstring(spark, sf).collect()
      .map(r => r.getAs[String]("span_hash") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_occ"), r.getAs[Long]("first_doc"))))
      .toMap
    assert(got.size == expected.size,
      s"span count mismatch: got ${got.size}, expected ${expected.size}")
    val md5 = java.security.MessageDigest.getInstance("MD5")
    expected.foreach { case (span, stats) =>
      val h = md5.digest(span.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(got.get(h).contains(stats), s"span '$span' stats ${got.get(h)} != $stats")
    }
  }

  test("text_boilerplate fractions equal an in-memory census replay") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val spans = docs.flatMap { case (id, w) =>
      w.sliding(8).filter(_.length == 8).map(sp => (id, sp.mkString(" ")))
    }
    val common = spans.groupBy(_._2).view
      .mapValues(_.map(_._1).distinct.length).filter(_._2 >= 2).keySet
    val expected = spans.groupBy(_._1).view.mapValues { occ =>
      val n = occ.length.toLong
      val f = occ.count(o => common(o._2)).toLong
      (n, f)
    }.toMap
    val got = Text.textBoilerplate(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, f) = expected(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_spans") == n && r.getAs[Long]("n_flagged") == f, s"row $r")
      assert(math.abs(r.getAs[Double]("boiler_frac") - f.toDouble / n) < 1e-12)
      assert(r.getAs[Boolean]("keep") == (f.toDouble / n <= 0.5))
    }
    // the synthetic corpus shares spans, so the signal is non-trivial
    assert(got.exists(_.getAs[Long]("n_flagged") > 0))
  }

  test("text_rarity equals an in-memory census replay") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSeq).toMap
    val census = docs.values.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val expected = docs.map { case (id, toks) =>
      val fs = toks.map(census)
      id -> (toks.size.toLong, fs.sum, fs.min, fs.count(_ == 1L).toLong)
    }
    val got = graft.dedup.Text.textRarity(spark, sf).collect()
    assert(got.length == docs.size)
    got.foreach { r =>
      val (n, sum, min, hapax) = expected(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == ((n, sum, min, hapax)),
        s"doc ${r.getLong(0)} stats diverge")
      assert(r.getDouble(5) == sum.toDouble / n.toDouble)
    }
  }

  test("text_span_mask equals an in-memory mask replay; accounting consistent") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    // corpus-common 8-gram census, then per-doc covered indices
    val spanDocs = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[Long]]
    docs.foreach { case (id, w) =>
      w.sliding(8).filter(_.length == 8)
        .foreach(g => spanDocs.getOrElseUpdate(g.mkString(" "), scala.collection.mutable.Set()) += id)
    }
    val common = spanDocs.collect { case (g, ds) if ds.size >= 2 => g }.toSet
    val rows = Text.textSpanMask(spark, sf).collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val (id, nWords, nMasked, masked) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      val w = docs(id)
      assert(nWords == w.length)
      val cov = w.sliding(8).zipWithIndex
        .filter { case (g, _) => g.length == 8 && common(g.mkString(" ")) }
        .flatMap { case (_, i) => i until i + 8 }.toSet
      assert(nMasked == cov.size, s"doc $id mask count")
      val exp = w.zipWithIndex.filterNot(p => cov(p._2)).map(_._1).mkString(" ")
      assert(masked == exp, s"doc $id masked text diverges")
    }
    assert(rows.exists(_.getLong(2) > 0), "no span masked — census suspect")
  }

  test("text_ngram_stats: top-20 trigrams with a deterministic total order") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val grams = docs.flatMap { case (id, w) =>
      w.sliding(3).filter(_.length == 3).map(g => (id, g.mkString(" ")))
    }
    val stats = grams.groupBy(_._2).view.mapValues { occ =>
      (occ.map(_._1).distinct.length.toLong, occ.length.toLong)
    }.toMap
    val expectedTop = stats.toSeq
      .sortBy { case (g, (nd, no)) => (-nd, -no, g) }.take(20)
    val got = Text.textNgramStats(spark, sf).collect()
      .map(r => (r.getAs[String]("g"),
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_occ"))))
    assert(got.toSeq == expectedTop, s"got ${got.toSeq}\nexpected $expectedTop")
  }

  test("ngram jaccard pairs are the planted near-dups (sim in [0.5, 1])") {
    val rows = Dedup.dedupNgramJaccard(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.5 && j <= 1.0)
    }
  }

  test("dedup_incremental: exact matches are complete, near matches are sound") {
    val rows = Dedup.dedupIncremental(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val hist = docs.filter { case (id, _) => id % 5 != 0 }
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == docs.keySet.filter(_ % 5 == 0))
    def trigrams(t: String): Set[String] =
      t.split(" ", -1).sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      // exact completeness: min same-text historical doc, or null
      val exactExpected = hist.collect { case (h, t) if t == docs(id) => h } match {
        case ids if ids.isEmpty => null
        case ids                => ids.min
      }
      assert(r.getAs[Any]("exact_dup_of") == exactExpected, s"doc $id exact")
      // near soundness: a reported near-dup really has jaccard >= 0.8
      Option(r.getAs[Any]("near_dup_of")).map(_.asInstanceOf[Long]).foreach { h =>
        val (a, b) = (trigrams(docs(id)), trigrams(docs(h)))
        val j = (a & b).size.toDouble / (a | b).size.toDouble
        assert(j >= 0.8, s"doc $id near_dup_of $h has jaccard $j < 0.8")
      }
      assert(r.getAs[Boolean]("is_new") ==
        (r.isNullAt(r.fieldIndex("exact_dup_of")) && r.isNullAt(r.fieldIndex("near_dup_of"))))
    }
    // the planted duplicates make the batch non-trivially dirty
    assert(rows.exists(!_.getAs[Boolean]("is_new")))
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

  test("ann-lsh: at most 5 ranked neighbors per query") {
    val rows = graft.dedup.Dedup.simAnnLsh(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q")).values.foreach(rs => assert(rs.length <= 5))
  }

  test("ann-lsh multi-probe recall@5 vs bruteforce truth") {
    val truth = Dedup.simTopkBruteforce(spark, sf)
      .select("q", "neighbor").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val ann = Dedup.simAnnLsh(spark, sf)
      .select("q", "neighbor").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recalls = truth.map { case (q, t) =>
      t.intersect(ann.getOrElse(q, Set.empty)).size.toDouble / t.size
    }
    val recall = recalls.sum / recalls.size
    info(f"ann recall@5 = $recall%.3f over ${recalls.size} queries")
    // radius-2 multi-probe (22 of 64 buckets). The synthetic test
    // embeddings are near-uniform (neighbor cosine ~0.4 -> bit
    // agreement ~0.63), LSH's worst case: binomial P(<=2 of 6 bits
    // flip) predicts ~0.6 here, and real clustered embeddings sit far
    // higher. Floor set under the prediction; number in SURVEY §5.
    assert(recall >= 0.5, f"multi-probe recall@5 $recall%.3f below floor")
  }

  test("ann-ivf recall@5 >= 0.9 on clustered embeddings (its target workload)") {
    // plant 16 well-separated clusters: centers are deterministic unit
    // vectors, members = center + small noise. IVF's contract is high
    // recall when neighbors share a cell — assert it.
    val sess = spark
    import sess.implicits._
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val centers = Array.fill(16)(unit(Array.fill(64)(rnd.nextGaussian())))
    val vectors = (0L until 400L).map { i =>
      val c = centers((i % 16).toInt)
      (i, unit(c.zip(Array.fill(64)(rnd.nextGaussian() * 0.15)).map { case (x, e) => x + e })
        .map(_.toFloat))
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_test").toString
    vectors.toDF("vec_id", "embedding").write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val truth = Dedup.simTopkBruteforce(spark, tmp)
      .select("q", "neighbor").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def recallOf(trainFraction: Double): Double = {
      val ivf = Dedup.annIvf(spark, tmp, k = 16, nprobe = 4, trainFraction)
        .select("q", "neighbor").collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val recalls = truth.map { case (q, t) =>
        t.intersect(ivf.getOrElse(q, Set.empty)).size.toDouble / t.size
      }
      recalls.sum / recalls.size
    }
    val recall = recallOf(1.0)
    info(f"ivf recall@5 = $recall%.3f over ${truth.size} queries")
    assert(recall >= 0.9, f"IVF recall@5 $recall%.3f below 0.9 on clustered data")
    // the 100 TB path: quantizer fitted on a 25% sample, full table
    // assigned with the fitted model — recall must hold
    val sampled = recallOf(0.25)
    info(f"ivf (sample-trained) recall@5 = $sampled%.3f")
    assert(sampled >= 0.9, f"sample-trained IVF recall@5 $sampled%.3f below 0.9")
  }

  test("sim_ann_ivf (committed quantizer) equals a driver-side exact replay") {
    // replay the whole registered pipeline in plain JVM arithmetic:
    // unit-normalize, assign to the first-minimum committed centroid
    // (FitPq.bestCenter — the trainer's own assignment), probe the 4
    // nearest lists by (dist, list), exact-cosine top-5 per query
    import graft.dedup.IvfCentroids
    import graft.tools.FitPq
    val cents = IvfCentroids.centroids.map(_.toArray).toArray
    def nrm(v: Array[Double]) = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
    def l2sq(a: Array[Double], b: Array[Double]) = {
      var d = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); d += t * t; i += 1 }; d
    }
    def cosine(a: Array[Double], b: Array[Double]) = {
      var dot = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); i += 1 }
      dot / (nrm(a) * nrm(b))
    }
    val assign = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .filter { case (_, v) => nrm(v) > 0 }
      .map { case (id, v) => (id, v, FitPq.bestCenter(v.map(_ / nrm(v)), cents)) }
    val expected = assign.filter(_._1 < 10).flatMap { case (q, vq, _) =>
      val uq = vq.map(_ / nrm(vq))
      val probed = cents.indices.map(c => (l2sq(uq, cents(c)), c)).sorted.take(4).map(_._2).toSet
      assign.filter(t => probed.contains(t._3) && t._1 != q)
        .map(t => (q, t._1, cosine(vq, t._2)))
        .sortBy { case (_, n, c) => (-c, n) }.take(5)
        .zipWithIndex.map { case ((qq, n, c), i) => (qq, n, c, i + 1) }
    }
    val got = graft.dedup.Dedup.queries("sim_ann_ivf")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.map(t => (t._1, t._2, t._4)).toSet ==
      expected.map(t => (t._1, t._2, t._4)).toSet)
    val gotCos = got.map(t => ((t._1, t._2), t._3)).toMap
    expected.foreach { case (q, n, c, _) =>
      assert(math.abs(gotCos((q, n)) - c) < 1e-12, s"cosine drift at ($q,$n)")
    }
  }

  test("simhash pairs equal an independent in-memory recomputation") {
    // recompute every signature from scratch with plain JVM
    // MessageDigest md5 (no Spark expression in the loop) and the full
    // O(n^2) Hamming<=7 pair set; the pigeonhole-blocked query must
    // return EXACTLY that set
    val sess = spark
    import sess.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def sig(text: String): (Long, Long) = {
      val counts = text.split(" ").groupBy(identity).view.mapValues(_.length.toLong)
      val v = new Array[Long](64)
      for ((w, cnt) <- counts) {
        val hex = md5hex(w)
        val ha = java.lang.Long.parseLong(hex.substring(0, 8), 16)
        val hb = java.lang.Long.parseLong(hex.substring(8, 16), 16)
        for (j <- 0 until 64) {
          val bit = if (j < 32) (ha >> j) & 1L else (hb >> (j - 32)) & 1L
          v(j) += (if (bit == 1L) cnt else -cnt)
        }
      }
      def half(lo: Int) = (lo until lo + 32)
        .foldLeft(0L)((acc, j) => if (v(j) > 0) acc | (1L << (j - lo)) else acc)
      (half(0), half(32))
    }
    val sigs = docs.map { case (id, text) => id -> sig(text) }
    val expected = (for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
      (ida, (saA, saB)) = sigs(i); (idb, (sbA, sbB)) = sigs(j)
      d = java.lang.Long.bitCount(saA ^ sbA) + java.lang.Long.bitCount(saB ^ sbB) if d <= 7
    } yield (math.min(ida, idb), math.max(ida, idb), d)).toSet
    val actual = Dedup.dedupSimhash(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(actual == expected,
      s"missing=${expected.diff(actual).take(5)} extra=${actual.diff(expected).take(5)}")
  }

  test("fingerprint: near-dup doc shares most fingerprints (prefix invariance)") {
    // winnowing property: a doc and the same doc with a prepended
    // paragraph select (mostly) the same min-hashes on the shared text
    val sess = spark
    import sess.implicits._
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .orderBy(length(col("text")).desc, col("doc_id")).select(col("text")).as[String].first()
    val tmp = java.nio.file.Files.createTempDirectory("graft_fp_test").toString
    Seq((1L, base, "en"), (2L, s"an unrelated leading paragraph goes here $base", "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val fps = Text.textFingerprint(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val f1 = fps.filter(_._1 == 1L).map(_._2).toSet
    val f2 = fps.filter(_._1 == 2L).map(_._2).toSet
    val overlap = f1.intersect(f2).size.toDouble / f1.size
    info(f"fingerprint overlap = $overlap%.3f")
    assert(overlap >= 0.8, f"prefix broke fingerprint stability: $overlap%.3f")
  }

  test("ngram maxDf cap: a planted stopword shingle stops blowing up pairs") {
    val sess = spark
    import sess.implicits._
    // 30 docs: all share one ubiquitous shingle ("aa bb cc"); only
    // docs 1 and 2 are real near-dups
    val stop = "aa bb cc"
    val docs = (1L to 30L).map { i =>
      val body = if (i <= 2) "real duplicate content here" else s"unique body $i x$i y$i z$i"
      (i, s"$stop $body", "en")
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_df_test").toString
    docs.toDF("doc_id", "text", "lang").write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val unfiltered = Dedup.ngramJaccard(spark, tmp, maxDf = None)
      .select("a", "b").count()
    val capped = Dedup.ngramJaccard(spark, tmp, maxDf = Some(10L))
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the stopword shingle links every doc pair at jaccard>=0 but only
    // the threshold keeps that bounded; with the cap the posting list
    // of the hot shingle is dropped entirely and only the real pair
    // survives candidate generation
    assert(capped == Set((1L, 2L)), s"capped pairs: $capped")
    assert(unfiltered >= capped.size)
    // cap high enough to keep everything = exact result
    val loose = Dedup.ngramJaccard(spark, tmp, maxDf = Some(1000L))
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccard(spark, tmp, maxDf = None)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose == exact)
  }

  test("dedup_clusters: partition of the corpus, keepers are cluster minima") {
    val rows = Dedup.dedupClusters(spark, sf).collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length == nDocs) // every doc classified exactly once
    rows.foreach { r =>
      assert(r.getAs[Long]("canonical_id") <= r.getAs[Long]("doc_id"))
      assert(r.getAs[Boolean]("is_keeper") == (r.getAs[Long]("doc_id") == r.getAs[Long]("canonical_id")))
    }
    // every verified near-dup pair lands in one cluster
    val comp = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
    Dedup.dedupNgramJaccard(spark, sf).filter(col("jaccard") >= 0.8)
      .select("a", "b").collect()
      .foreach(r => assert(comp(r.getLong(0)) == comp(r.getLong(1)),
        s"pair ${r.getLong(0)},${r.getLong(1)} split across clusters"))
  }

  test("dedup_semantic equals an in-memory bucket + union-find replay") {
    val rows = Dedup.dedupSemantic(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("canonical_id"),
        r.getAs[Boolean]("is_keeper")))
    // independent replay: hyperplane buckets + within-bucket cosine +
    // union-find, no Spark machinery
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray).sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val planes = Dedup.testLshPlanes
    def bucket(v: Array[Double]): Int =
      planes.zipWithIndex.map { case (w, j) =>
        if (dot(v, w.toArray) > 0) 1 << j else 0 }.sum
    val parent = scala.collection.mutable.Map(vecs.map(v => v._1 -> v._1): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for {
      (ia, va) <- vecs; (ib, vb) <- vecs
      if ia < ib && bucket(va) == bucket(vb)
      if dot(va, vb) / (math.sqrt(dot(va, va)) * math.sqrt(dot(vb, vb))) >= 0.4
    } {
      val (ra, rb) = (find(ia), find(ib))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val exp = vecs.map { case (id, _) =>
      val c = find(id); (id, c, id == c)
    }.toSet
    assert(rows.length == vecs.length && rows.toSet == exp,
      s"semantic clusters diverge from the union-find replay " +
        s"(${rows.count(!_._3)} vs ${exp.count(!_._3)} non-keepers)")
    assert(rows.exists(!_._3), "no semantic dup found — threshold or buckets suspect")
  }

  test("contamination: a planted eval copy inside the corpus is flagged") {
    val sess = spark
    import sess.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_cont_test").toString
    val evalText = "the quick brown fox jumps over the lazy dog again and again tonight"
    val docs = Seq(
      (5L, evalText, "en"),                                   // eval doc (id < 25)
      (10L, "completely unrelated benchmark text here", "en"), // eval, no copy
      (100L, s"crawl preamble $evalText crawl postamble", "en"), // contaminated corpus doc
      (200L, "an innocent corpus document with its own words", "en"))
    docs.toDF("doc_id", "text", "lang").write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val flagged = graft.dedup.Text.textContamination(spark, tmp).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("eval_id"))).toSet
    assert(flagged.contains((100L, 5L)), s"planted contamination not flagged: $flagged")
    assert(!flagged.exists(_._1 == 200L), s"innocent doc flagged: $flagged")
  }

  test("repetition metrics on a planted repetitious doc") {
    val sess = spark
    import sess.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_rep_test").toString
    Seq((1L, "a a a a a b", "en"), (2L, "v w x y z q", "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Text.textRepetition(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val rep = rows(1L)
    assert(rep.getAs[Int]("n_words") == 6)
    assert(math.abs(rep.getAs[Double]("dup_word_frac") - 4.0 / 6.0) < 1e-12)
    assert(math.abs(rep.getAs[Double]("top_bigram_frac") - 4.0 / 5.0) < 1e-12) // "a a" x4 of 5
    assert(!rep.getAs[Boolean]("keep"))
    val clean = rows(2L) // all-distinct words: nothing repeats
    assert(clean.getAs[Double]("dup_word_frac") == 0.0)
    assert(clean.getAs[Boolean]("keep"))
  }

  test("scrub redacts planted email, digit run, and deny-listed entity words") {
    val sess = spark
    import sess.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_scrub_test").toString
    Seq((1L, "contact john.doe@example.com or customer 12345678 today", "en"),
        (2L, "nothing to hide here", "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val byId = Text.textScrub(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[String]("clean_text") == "contact <PII> or <PII> <PII> today")
    assert(byId(1L).getAs[Int]("n_redactions") == 3)
    assert(byId(2L).getAs[String]("clean_text") == "nothing to hide here")
    assert(byId(2L).getAs[Int]("n_redactions") == 0)
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

  test("mm_framesample: fan-out count matches payload sizes; sigs recompute in-JVM") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val frames = Multimodal.mmFrameSample(spark, sf).collect()
    val byDoc = frames.groupBy(_.getAs[Long]("doc_id"))
    // empty payloads emit zero frames (and so no key), matching the oracle
    assert(byDoc.keySet == docs.filter(_._2.nonEmpty).keySet)
    byDoc.foreach { case (id, fs) =>
      val bytes = docs(id).getBytes("UTF-8")
      val expectedN =
        if (bytes.isEmpty) 0 else math.min(8, 1 + (bytes.length - 1) / 200)
      assert(fs.length == expectedN, s"doc $id: ${fs.length} frames, expected $expectedN")
      val f0 = fs.find(_.getAs[Int]("frame_idx") == 0).get
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(bytes, 0, math.min(200, bytes.length))
      val sig = md.digest().map("%02x".format(_)).mkString
      assert(f0.getAs[String]("frame_sig") == sig)
    }
  }

  test("mm_dedup: byte-level groups partition the corpus, canonical is min id") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val groups = Multimodal.mmDedup(spark, sf).collect()
    assert(groups.map(_.getAs[Long]("n_copies")).sum == docs.length)
    val byText = docs.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    groups.foreach { r =>
      // every group's stats match SOME text group (md5 is on the bytes
      // of exactly one text value)
      val ids = byText.values.find(v =>
        v.length.toLong == r.getAs[Long]("n_copies") && v.min == r.getAs[Long]("keep_id"))
      assert(ids.isDefined, s"group $r matches no text group")
    }
  }

  test("mm_shard: contiguous byte addresses, offsets inside the budget, greedy placement") {
    val rows = Multimodal.mmShard(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (fmt, objs) =>
      val ordered = objs.sortBy(_._1)
      // addresses are a contiguous byte layout: each object starts
      // exactly where the previous one ends
      var expectStart = 0L
      ordered.foreach { case (id, _, n, shard, off) =>
        assert(shard == expectStart / 4096, s"$fmt/$id shard_idx")
        assert(off == expectStart - shard * 4096, s"$fmt/$id byte_offset")
        assert(off >= 0 && off < 4096, s"$fmt/$id offset outside budget")
        expectStart += n
      }
    }
  }

  test("mm_near_dup: pairs recompute from an in-memory chunk scan; bounds hold") {
    val got = graft.dedup.Multimodal.mmNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty, "the planted near-dups must share aligned chunks")
    got.foreach { case (a, b, shared, na, nb) =>
      assert(a < b, "canonical pair order")
      assert(shared >= 3 && shared <= math.min(na, nb),
        s"shared $shared outside [3, min($na,$nb)] for ($a,$b)")
    }
    // in-memory replay: chunk every payload, count aligned matches
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8")).toMap
    def chunks(p: Array[Byte]): Seq[Seq[Byte]] = p.grouped(64).map(_.toSeq).toSeq
    val expected = (for {
      (a, pa) <- docs.toSeq; (b, pb) <- docs.toSeq if a < b
      ca = chunks(pa); cb = chunks(pb)
      shared = ca.zip(cb).count { case (x, y) => x == y }
      if shared >= 3
    } yield (a, b, shared.toLong, ca.size.toLong, cb.size.toLong)).toSet
    assert(got.toSet == expected,
      s"pairs diverge from the in-memory replay: ${got.length} vs ${expected.size}")
  }

  test("mm_meta: deterministic features, one row per doc, stub recomputes in-JVM") {
    val a = Multimodal.mmMeta(spark, sf).orderBy("doc_id").collect()
    val b = Multimodal.mmMeta(spark, sf).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.length == docs.size)
    val md = java.security.MessageDigest.getInstance("MD5")
    a.foreach { r =>
      val d = md.digest(docs(r.getAs[Long]("doc_id")).getBytes("UTF-8"))
      val cs = (0 until 8).foldLeft(0L)((v, i) => (v << 8) | (d(i) & 0xffL)) >>> 4
      assert(r.getAs[Long]("checksum") == cs)
      assert(r.getAs[Int]("width") == 320 + (cs % 1601).toInt)
      assert(r.getAs[Int]("height") == 240 + ((cs / 7) % 841).toInt)
    }
  }

  test("stream_quality equals the batch quality gate row-for-row") {
    val batch = Text.textQuality(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.toSeq).toMap
    val stream = Streaming.streamQuality(spark, sf).collect()
    assert(stream.length == batch.size)
    stream.foreach { r =>
      assert(r.toSeq == batch(r.getAs[Long]("doc_id")), s"doc ${r.get(0)}")
    }
  }

  test("stream_cardinality equals the batch HLL register state over events") {
    graft.functions.GraftFunctions.registerAll(spark)
    val streamed = Streaming.streamCardinality(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4))).toSet
    val batch = graft.dedup.Sketch.hllSummary(
      graft.dedup.Sketch.hllParts(
        graft.sources.Tables.events(spark, sf)
          .withColumn("h", expr("md5_p60(CAST(user_id AS STRING))")))
        .groupBy(window(col("ts"), "1 hour"), col("event_type"), col("bucket"))
        .agg(max(col("rho")).as("reg"))
        .withColumn("wstart", date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")),
      Seq("wstart", "event_type"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4))).toSet
    assert(streamed == batch, "streaming register state diverged from batch")
  }

  test("stream_topk: CMS estimates bound the exact counts, probes are the true top-5") {
    val rows = Streaming.streamTopk(spark, sf).collect()
    assert(rows.nonEmpty)
    // the one-sided CMS contract on every probe, and a sane overcount
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("n_exact"),
        s"CMS undercounted ${r.getAs[Long]("user_id")}")
      assert(r.getAs[Long]("overcount") ==
        r.getAs[Long]("cms_est") - r.getAs[Long]("n_exact"))
    }
    // at most 5 probes per (window, type); probe sets equal the exact
    // batch top-5 under the deterministic tie-break
    val byWin = rows.groupBy(r => (r.getString(0), r.getString(1)))
    assert(byWin.values.forall(_.length <= 5))
    val exact = graft.sources.Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w"),
        col("event_type"), col("user_id"), col("n"))
      .collect().groupBy(r => (r.getString(0), r.getString(1)))
    byWin.foreach { case (k, probeRows) =>
      val expTop = exact(k).sortBy(r => (-r.getLong(3), r.getLong(2)))
        .take(probeRows.length).map(r => r.getLong(2)).toSet
      assert(probeRows.map(_.getAs[Long]("user_id")).toSet == expTop,
        s"probe set for $k is not the exact top-5")
    }
  }

  test("stream enrich (stream-static join) equals batch join-aggregation") {
    val streamed = Streaming.streamEnrich(spark, sf)
      .select("wstart", "segment", "n_events")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val batch = graft.sources.Tables.events(spark, sf)
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss"), col("c_mktsegment"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
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

  test("stream_sessionize typed state survives an NTZ-encoded events source") {
    // round-6 incident class: the driver regenerated events.parquet as
    // MICROS/NTZ and the typed flatMapGroupsWithState path failed with
    // LocalDateTime-vs-java.sql.Timestamp. The contract now: streaming
    // reads through Tables.events, so a fixture dir with an NTZ ts
    // must produce the exact batch sessionization.
    import org.apache.spark.sql.types.TimestampNTZType
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ntz_stream").toString
    val base = 1_700_000_000_000_000L // µs
    val rows = for {
      u <- 1L to 3L; s <- 0L to 2L; e <- 0L to 3L
    } yield (u * 100 + s * 10 + e,
      base + s * 3_600_000_000L + e * 60_000_000L + u * 7_000_000L,
      u, "click", 1.5 * e)
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
      .write.parquet(s"$dir/events.parquet")
    val streamed = Streaming.streamSessionize(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val batch = graft.queries.Relational.qSessionize(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(streamed.nonEmpty && streamed == batch,
      s"NTZ streaming sessions diverge: ${streamed.size} vs ${batch.size}")
    // 3 sessions per user (1-hour gaps > the 30-min session gap)
    assert(streamed.count(_._1 == 1L) == 3)
  }

  test("stream dedup drops every redelivered copy (totals equal the original stream)") {
    val events = graft.sources.Tables.events(spark, sf)
    // the redelivery is real: a nonempty subset was published twice
    assert(events.filter(col("event_id") % 7 === 0).count() > 0)
    val dedupedTotal = Streaming.streamDedup(spark, sf)
      .agg(sum("n_events")).first().getLong(0)
    assert(dedupedTotal == events.count(),
      s"deduped total $dedupedTotal != original ${events.count()} — a copy survived")
  }

  test("stream_cdc lands byte-identical to the batch MERGE snapshot") {
    val streamed = Streaming.streamCdc(spark, sf).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2), r.getString(3))).toSet
    val batch = graft.queries.Incremental.qCdcMerge(spark, sf).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2), r.getString(3))).toSet
    assert(streamed.nonEmpty && streamed == batch,
      s"CDC apply paths diverge: ${streamed.size} streamed vs ${batch.size} batch")
    // every CDC path is present in the result: updates won, deletes
    // removed their key, delete-then-reinsert came back, fresh keys in
    assert(streamed.exists(_._4 == "U"), "no surviving update")
    assert(!streamed.exists(t => t._1 % 7 == 0 && t._1 % 14 != 0 && t._1 < 1000000000L),
      "a deleted key survived")
    assert(streamed.exists(t => t._1 % 14 == 0 && t._2.exists(_.startsWith("REINS"))),
      "no delete-then-reinsert key")
    assert(streamed.exists(_._1 >= 1000000000L), "no fresh insert")
  }

  test("stream-stream join emits exactly the batch interval-join pairs") {
    val streamed = Streaming.streamStreamJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val e = graft.sources.Tables.events(spark, sf)
    val batch = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
      .join(e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id").as("pu"), col("ts").as("pts")),
        col("user_id") === col("pu") &&
          col("pts") >= col("cts") && col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        (unix_micros(col("pts")) - unix_micros(col("cts"))).as("gap_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("knn graph: NN-Descent lifts recall@10 well above the seed graph") {
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .selectExpr("cast(vec_id as long) id", "cast(embedding as array<double>) v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val ids = vecs.keys.toArray
    val truth = ids.map { q =>
      q -> ids.filter(_ != q).map(t => (cos(vecs(q), vecs(t)), t))
        .sortBy { case (c, t) => (-c, t) }.take(10).map(_._2).toSet
    }.toMap
    val got = graft.dedup.Dedup.simKnnGraph(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    // seed-graph recall baseline: md5 neighbors are essentially random
    val n = ids.length
    def md5mod(s: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(8)
      val hex = h.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % n
    }
    val seed = ids.map { q =>
      q -> (0 until 10).map(j => md5mod(s"$q|init|$j"))
        .map(h => if (h == q) (h + 1) % n else h).toSet
    }.toMap
    def recall(g: Map[Long, Set[Long]]): Double =
      ids.map(q => (g.getOrElse(q, Set.empty) intersect truth(q)).size / 10.0).sum / n
    val rG = recall(got); val rS = recall(seed)
    assert(rG > rS + 0.2, s"NN-Descent recall $rG barely improves seed $rS")
    assert(rG >= 0.5, s"final kNN-graph recall@10 $rG below floor")
  }

  test("text_html_extract: entities decode, groups map by icon, paragraph text round-trips") {
    import org.apache.spark.sql.functions._
    val out = graft.dedup.Text.textHtmlExtract(spark, sf)
    val docs = graft.sources.Tables.documents(spark, sf)
    // the collapsed <p> blocks must reproduce the original text exactly
    assert(out.join(docs, "doc_id")
      .filter(out("text") =!= trim(docs("text"))).count() == 0,
      "extracted paragraph text must round-trip to the source text")
    val r = out.filter(col("doc_id") === 7).collect()(0)
    assert(r.getAs[String]("title") == "Doc 7 & friends", "entity &amp; must decode")
    assert(r.getAs[String]("grp") == "lesbian", "7 % 3 = 1 -> round icon -> lesbian")
    assert(r.getAs[Int]("year") == 1907 && r.getAs[String]("date_text") == "8. Mai 1907")
    // location fires iff the marker attribute is present (doc_id % 5)
    assert(out.filter(col("location").isNotNull).count() ==
      docs.filter(col("doc_id") % 5 === 0).count())
    // every group arm fires
    assert(out.select("grp").distinct().count() == 3)
  }

  test("text_pdf_segments: every font-rule arm fires; fill-down matches an in-memory replay") {
    val out = graft.dedup.Text.textPdfSegments(spark, sf)
    val fmts = out.select("fmt").distinct().collect().map(_.getString(0)).toSet
    assert(fmts == Set("heading", "location_header", "p", "image_caption"),
      s"page rows dropped, none-arm never fires, all real arms do; got $fmts")
    // replay the sequential fill-down exactly
    val rows = out.orderBy("page", "fmt").collect()
    var lastLoc: String = null
    val colonRe = java.util.regex.Pattern.compile("(.+):")
    var inherited = 0
    rows.foreach { r =>
      val (fmt, text) = (r.getAs[String]("fmt"), r.getAs[String]("text"))
      val l0 = fmt match {
        case "location_header" => text
        case "heading" =>
          val m = colonRe.matcher(text)
          if (m.find()) m.group(1) else { inherited += 1; null }
        case _ => "München"
      }
      if (l0 != null) lastLoc = l0
      assert(r.getAs[String]("location") == lastLoc,
        s"page ${r.getAs[Int]("page")} $fmt: fill-down diverges")
    }
    assert(inherited > 0, "no colon-less heading — the fill-down inheritance went untested")
  }

  test("text_ner_batch: offsets index back into the text; all three rule arms fire") {
    import org.apache.spark.sql.functions._
    val out = graft.dedup.Text.textNerBatch(spark, sf)
    // every (start_off, mention) must round-trip: the substring of the
    // source text at the reported offset IS the mention
    val bad = out.join(graft.sources.Tables.documents(spark, sf), "doc_id")
      .filter(expr("substring(text, CAST(start_off AS INT), length(mention)) <> mention"))
      .count()
    assert(bad == 0, s"$bad mentions whose offset does not point at the mention")
    val arms = out.select("ner_type").distinct().collect().map(_.getString(0)).toSet
    assert(arms == Set("PRODUCT", "ROLE", "TOPIC"),
      s"gazetteer, suffix-regex and context arms must all fire; got $arms")
    // rule priority: a gazetteer token is never emitted under a weaker arm
    val gaz = graft.sources.Tables.part(spark, sf)
      .select(explode(split(lower(col("p_name")), " ")).as("m")).distinct()
    assert(out.filter(col("ner_type") =!= "PRODUCT")
      .join(gaz, out("mention") === gaz("m")).count() == 0)
  }

  test("text_ner_ingest: parsed spans slice real tokens; labels and parity rule hold") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = graft.dedup.Text.textNerIngest(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (id, label, name) = (r.getLong(0), r.getString(1), r.getString(2))
      val toks = docs(id).split(" ", -1)
      assert(Set("PER", "LOC", "ORG")(label))
      // the sliced mention is exactly the designated token (texts are
      // clean words, so the punctuation trim is the identity here)
      if (label == "ORG") assert(name == toks(4), s"doc $id ORG: '$name' vs '${toks(4)}'")
      else {
        assert(name == toks(1), s"doc $id $label: '$name' vs '${toks(1)}'")
        assert(label == (if (id % 2 == 0) "PER" else "LOC"), "parity rule")
      }
    }
    // short docs carry no ORG span; one-token docs are dropped entirely
    val shortDocs = docs.filter(_._2.split(" ", -1).length < 5).keySet
    assert(out.filter(r => shortDocs(r.getLong(0))).forall(_.getString(1) != "ORG"))
  }

  test("er_id_chain: every cascade match chains; misses are explicit NA rows") {
    import graft.er.ER
    val chain = ER.erIdChain(spark, sf).collect()
    val matched = ER.erLinkCascade(spark, sf)
      .filter(col("auth_id").isNotNull).count()
    assert(chain.length == matched, "one chain row per cascade match, hits AND misses")
    chain.foreach { r =>
      val (gnd, qid, found) = (r.getLong(1), Option(r.getString(2)), r.getBoolean(3))
      assert(found == qid.isDefined)
      if (gnd % 3 == 0) assert(qid.isEmpty, "ids = 0 mod 3 have no Wikidata twin")
      else assert(qid.contains("Q" + (gnd * 7 % 900000)))
    }
    assert(chain.exists(!_.getBoolean(3)) && chain.exists(_.getBoolean(3)),
      "both hit and explicit-NA rows must occur")
  }
}
