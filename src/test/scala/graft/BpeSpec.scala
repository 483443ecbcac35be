package graft

import org.apache.spark.sql.functions._

import graft.dedup.Bpe

class BpeSpec extends SparkSpec {

  test("text_bpe_train runs, emits one rule per merge step, and has an oracle") {
    val df = Bpe.bpeTrain(spark, sf)
    val rows = df.collect()
    assert(rows.length == Bpe.Merges)
    assert(rows.map(_.getInt(0)).sorted.toSeq == (1 to Bpe.Merges))
    assert(Bpe.oracles.contains("text_bpe_train"))
  }

  test("learned rules match a textbook in-memory BPE replay") {
    // independent reimplementation: symbol lists + pair counting +
    // greedy run-merging, no string/replace tricks — if the bracketed
    // replace representation diverged from real BPE, this would catch it
    val census: Seq[(Vector[String], Long)] = spark.read
      .parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").count().collect()
      .map(r => (r.getString(0).map(_.toString).toVector, r.getLong(1))).toSeq

    var words = census
    val expected = (1 to Bpe.Merges).map { _ =>
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, cnt) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0L) + cnt
          case _            =>
        }
      }
      val ((l, r), f) = pairCounts.toSeq
        .minBy { case ((a, b), n) => (-n, s"<$a><$b>") }
      words = words.map { case (syms, cnt) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2 // greedy left-to-right, runs included
          } else { out += syms(i); i += 1 }
        }
        (out.toVector, cnt)
      }
      (s"<$l><$r>", s"<${l + r}>", f)
    }

    val got = Bpe.bpeTrain(spark, sf).orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expected, s"rules diverge:\n got=$got\n exp=$expected")
  }

  test("text_bpe_encode matches an in-memory application of the learned rules") {
    val rules = Bpe.bpeTrain(spark, sf).orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2)))
    def encTokens(w: String): Long =
      if (w.matches("^[a-z]+$")) {
        val r = rules.foldLeft(w.map(c => s"<$c>").mkString) {
          case (s, (p, m)) => s.replace(p, m)
        }
        r.count(_ == '<').toLong
      } else 1L
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Bpe.bpeEncode(spark, sf).collect()
    assert(got.length == docs.size, "one row per document, empty docs included")
    got.foreach { r =>
      val words = docs(r.getLong(0)).split(" ").filter(_.nonEmpty).toSeq
      assert(r.getLong(1) == words.length, s"n_words off for doc ${r.getLong(0)}")
      val exp = words.map(encTokens).sum
      assert(r.getLong(2) == exp, s"bpe_tokens off for doc ${r.getLong(0)}")
      // merges only ever shrink: word-count ≤ tokens ≤ character count
      assert(r.getLong(2) >= r.getLong(1))
    }
  }
}
