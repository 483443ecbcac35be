package graft

import org.apache.spark.sql.functions._

import graft.dedup.Sketch

/** The sketch operators' ERROR CONTRACTS — the float estimates the
  * oracle deliberately excludes (integer sketch state only) are
  * computed and bounded here. */
class SketchSpec extends SparkSpec {

  test("every sketch query runs, has rows, and a matching oracle") {
    Sketch.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
      assert(Sketch.oracles.contains(name), s"$name missing oracle SQL")
    }
  }

  test("sketch_hll estimate lands within 25 % of exact distinct (m=64, 3 sigma)") {
    val rows = Sketch.sketchHll(spark, sf)
      .select("lang", "m", "occupied", "sum_scaled", "exact_distinct").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getInt(1).toDouble
      val occupied = r.getLong(2)
      val sumScaled = r.getLong(3)
      val exact = r.getLong(4).toDouble
      // standard HLL: alpha_m * m^2 / sum(2^-M[j]); sum_scaled is that
      // denominator scaled by 2^55. Small-range (linear counting)
      // correction when est <= 2.5m and empty registers exist.
      val alpha = 0.709 // alpha_64
      val raw = alpha * m * m * (1L << 55).toDouble / sumScaled.toDouble
      val zeros = m - occupied
      val est =
        if (raw <= 2.5 * m && zeros > 0) m * math.log(m / zeros) else raw
      val relErr = math.abs(est - exact) / exact
      assert(relErr <= 0.25,
        s"lang=${r.getString(0)}: est=$est exact=$exact relErr=$relErr")
    }
  }

  test("sketch_cms never undercounts, and the grid bounds the overcount") {
    val rows = Sketch.sketchCms(spark, sf)
      .select("term", "n_exact", "cms_est", "overcount").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS undercounted '${r.getString(0)}': est=${r.getLong(2)} exact=${r.getLong(1)}")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
    // d=4 rows of w=1024 counters over this corpus: the canonical
    // epsilon*N bound (e/w * N) holds with margin at test scale
    val total = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " "))).count()
    val bound = math.E / 1024.0 * total.toDouble
    rows.foreach(r => assert(r.getLong(3).toDouble <= bound,
      s"overcount ${r.getLong(3)} above e/w*N bound $bound for '${r.getString(0)}'"))
  }

  test("deployment path: spark's bloom_filter_agg agrees on members, small fp rate") {
    // the relational position-set form is the oracle-replayable
    // skeleton; the production probe is a broadcast bitset — Spark's
    // own bloom_filter_agg/might_contain IS that path (different hash
    // family, so different fp SET, but the membership contract and
    // size/fpp economics are the same)
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val build = docs.filter(col("doc_id") % 3 =!= 0).select("text").distinct()
    // distributed build (aggregated per partition, merged) — the
    // broadcast-able bitset object
    val bf = build.stat.bloomFilter("text", 1000L, 0.03)
    val actual = docs.join(build.withColumn("m", lit(1)), Seq("text"), "left")
      .select(col("doc_id"), col("text"), (coalesce(col("m"), lit(0)) === 1).as("actual"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    actual.foreach { case (id, text, isMember) =>
      if (isMember) assert(bf.mightContain(text), s"native bloom false negative on doc $id")
    }
    val fps = actual.count { case (_, text, isMember) => !isMember && bf.mightContain(text) }
    val nonMembers = actual.count(!_._3)
    assert(nonMembers == 0 || fps.toDouble / nonMembers < 0.2,
      s"native bloom fp rate $fps/$nonMembers implausibly high")
  }

  test("sketch_bloom has zero false negatives and data-sized m") {
    val rows = Sketch.sketchBloom(spark, sf)
      .select("doc_id", "bloom_hit", "actual", "is_fp", "n_build", "m_bits").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (r.getBoolean(2)) assert(r.getBoolean(1),
        s"false negative on doc ${r.getLong(0)} — impossible for a correct Bloom filter")
      assert(r.getBoolean(3) == (r.getBoolean(1) && !r.getBoolean(2)))
    }
    // m = next power of two of 8 * n_build
    val n = rows.head.getLong(4)
    val m = rows.head.getLong(5)
    assert((m & (m - 1)) == 0, s"m_bits $m not a power of two")
    assert(m >= 8 * n && m < 16 * n, s"m_bits $m not the next pow2 of 8*$n")
    // membership split is non-trivial in both directions
    assert(rows.exists(_.getBoolean(2)) && rows.exists(!_.getBoolean(2)))
  }

  test("histo: bins partition the data; quantile bins bracket the exact order statistic") {
    val rows = graft.dedup.Sketch.sketchHisto(spark, sf).collect()
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1).toLong))
    val byFlag = li.groupBy(_._1)
    // counts add up exactly per flag and per bin
    val gotByFlag = rows.groupBy(_.getString(0))
    assert(gotByFlag.keySet == byFlag.keySet)
    gotByFlag.foreach { case (f, bins) =>
      val vals = byFlag(f).map(_._2).sorted
      assert(bins.map(_.getLong(2)).sum == vals.length)
      bins.foreach { b =>
        val bin = b.getInt(1)
        val n = vals.count(v => (v - 1) / 5 == bin)
        assert(b.getLong(2) == n, s"flag $f bin $bin: ${b.getLong(2)} vs $n")
      }
      // the flagged p50/p90 bins contain the exact order statistics
      val p50 = vals((vals.length + 1) / 2 - 1)
      val p90 = vals((vals.length * 9 + 9) / 10 - 1)
      assert(bins.filter(_.getBoolean(4)).map(_.getInt(1)).toSeq == Seq(((p50 - 1) / 5).toInt))
      assert(bins.filter(_.getBoolean(5)).map(_.getInt(1)).toSeq == Seq(((p90 - 1) / 5).toInt))
    }
  }
}
