package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** BPE tokenizer training over `documents` (SURVEY §2.D): the
  * merge-rule learner that sits between the vocabulary census
  * (`search_vocab`) and token counting (`text_tokens`) in a real
  * training-data pipeline. Learns the first [[Merges]] byte-pair
  * merges exactly as the classic algorithm does — count adjacent
  * symbol pairs over the word census, merge the most frequent pair
  * everywhere, repeat — and emits the learned rules with their
  * selection-time frequencies.
  *
  * Representation: each word is rendered with every symbol wrapped in
  * angle brackets (`abc` → `<a><b><c>`), so a merge is a plain
  * left-to-right `replace` of `<x><y>` with `<xy>` — token-boundary
  * aligned by construction (a symbol can never match across brackets,
  * and greedy non-overlapping replace merges runs exactly like the
  * textbook scan: `<a><a><a><a>` → `<aa><aa>`). Both engines' `replace`
  * share these semantics, so the DuckDB oracle replays the whole
  * training loop bit-for-bit. Words are pre-filtered to `[a-z]+` so the
  * marker characters cannot occur in a symbol.
  *
  * Scale notes (100 TB): the corpus is touched ONCE, by the word
  * census (map-side-partial groupBy — aggregate state is
  * vocabulary-sized). Every merge iteration runs on the census, not
  * the corpus: pair explode ∝ Σ word lengths over the VOCABULARY,
  * best-pair selection is a 1-row TakeOrdered broadcast back into the
  * vocabulary-sized replace. This is exactly why production BPE
  * trainers (GPT-2, SentencePiece-BPE) train from a word-count table.
  * Each step's census is checkpointed (vocabulary-sized) so the lazy
  * chain doesn't re-run prior steps' work per iteration, and freed
  * before return.
  */
object Bpe {

  /** Learned merge count — 3 keeps the unrolled oracle SQL readable
    * while exercising the loop (rule i+1 depends on the corpus as
    * rewritten by rules 1..i). */
  val Merges = 3

  /** Adjacent symbol pairs of a `syms` array column. Guard: Spark
    * `sequence(1, 0)` DESCENDS — a 1-symbol word must yield no pairs,
    * not a reversed index walk. */
  private def adjacentPairs: Column =
    when(size(col("syms")) >= 2,
      expr("transform(sequence(1, size(syms) - 1), " +
        "k -> concat(element_at(syms, k), element_at(syms, k + 1)))"))
      .otherwise(array().cast("array<string>"))

  /** text_bpe_train — the first [[Merges]] learned BPE merge rules:
    * `(step, pair, merged, freq)` where `pair` is the bracketed symbol
    * pair chosen at that step (most frequent, ties broken
    * lexicographically) and `freq` its census-weighted count at
    * selection time. */
  def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    // the single corpus pass: alpha-word census (vocabulary-sized)
    val census = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(regexp_replace(col("w"), "(.)", "<$1>").as("rep"), col("cnt"))
      .transform(graft.util.Checkpoints.compact(_, eager = true))

    var reps = census
    val owned = scala.collection.mutable.ListBuffer[DataFrame](census)
    val merges = (1 to Merges).map { step =>
      val pairs = reps
        .select(regexp_extract_all(col("rep"), lit("<[^>]*>"), lit(0)).as("syms"), col("cnt"))
        .select(explode(adjacentPairs).as("pair"), col("cnt"))
        .groupBy(col("pair")).agg(sum(col("cnt")).as("freq"))
      val best = pairs.orderBy(col("freq").desc, col("pair")).limit(1)
        .select(col("pair").as("bp"), col("freq").as("bf"))
        .transform(graft.util.Checkpoints.compact(_, eager = true))
      owned += best
      reps = reps.crossJoin(broadcast(best))
        .select(expr("replace(rep, bp, replace(bp, '><', ''))").as("rep"), col("cnt"))
        .transform(graft.util.Checkpoints.compact(_, eager = true))
      owned += reps
      best.select(lit(step).as("step"), col("bp").as("pair"),
        expr("replace(bp, '><', '')").as("merged"), col("bf").as("freq"))
    }
    val out = merges.reduce(_ union _).transform(graft.util.Checkpoints.compact(_, eager = true))
    owned.foreach(graft.util.Checkpoints.free)
    out
  }

  /** text_bpe_encode — APPLY the learned merges back to the corpus:
    * per document, the BPE token count under the trained rules (plus
    * the word count), completing the tokenizer loop train → encode.
    * Encoding is a pure projection: each alpha word renders bracketed,
    * the [[Merges]] rules replay in training order as plain string
    * replaces (the same representation argument as training), and the
    * token count is the surviving `<` count; non-alpha words count 1
    * (the single-OOV-token convention, documented). Everything runs
    * inside ONE whole-stage-codegen scan — array higher-order
    * functions, no explode, no shuffle beyond none at all.
    *
    * Scale notes (100 TB): the merge rules are a MODEL ARTIFACT
    * (vocabulary-sized — here 3 rows, collected to the driver and
    * inlined as literals, the PqCodebook pattern); a production run
    * persists them once and encodes any corpus without retraining.
    * This entry retrains on the gate corpus so the whole loop stays
    * self-contained and oracle-replayable. */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val rules = bpeTrain(spark, dir).orderBy(col("step"))
      .select("pair", "merged").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val enc = rules.foldLeft(
        "regexp_replace(w, '(.)', '<$1>')") { case (e, (p, m)) =>
      s"replace($e, '$p', '$m')"
    }
    val tokOf = s"CASE WHEN w rlike '^[a-z]+$$' " +
      s"THEN length($enc) - length(replace($enc, '<', '')) ELSE 1 END"
    Tables.documents(spark, dir).select(
      col("doc_id"),
      expr("size(filter(split(text, ' '), w -> w != ''))").cast("long").as("n_words"),
      expr(s"aggregate(filter(split(text, ' '), w -> w != ''), 0L, (a, w) -> a + ($tokOf))")
        .as("bpe_tokens"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bpe_train"  -> (bpeTrain _),
    "text_bpe_encode" -> (bpeEncode _))

  val oracles: Map[String, String] = {
    // unrolled training loop: rN = census rewritten by merges 1..N
    val steps = (1 to Merges).map { i =>
      s"""p$i AS (
         |  SELECT pair, sum(cnt) AS freq
         |  FROM (SELECT unnest(list_transform(range(1, len(syms)), k -> syms[k] || syms[k+1])) AS pair, cnt
         |        FROM (SELECT regexp_extract_all(rep, '<[^>]*>') AS syms, cnt FROM r${i - 1}))
         |  GROUP BY 1),
         |b$i AS (SELECT pair, freq FROM p$i ORDER BY freq DESC, pair LIMIT 1),
         |r$i AS (SELECT replace(rep, b$i.pair, replace(b$i.pair, '><', '')) AS rep, cnt FROM r${i - 1}, b$i)"""
        .stripMargin
    }.mkString(",\n")
    val rows = (1 to Merges).map(i =>
      s"SELECT CAST($i AS INTEGER) AS step, pair, replace(pair, '><', '') AS merged, freq::BIGINT AS freq FROM b$i")
      .mkString("\nUNION ALL ")
    val trainCtes =
      s"""census AS (
         |  SELECT w, count(*) AS cnt
         |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
         |  WHERE regexp_full_match(w, '[a-z]+')
         |  GROUP BY 1),
         |r0 AS (SELECT regexp_replace(w, '(.)', '<\\1>', 'g') AS rep, cnt FROM census),
         |$steps""".stripMargin
    // encode: replay the learned rules in training order as scalar
    // subqueries over the SAME b1..bN the training oracle selects from
    val encExpr = (1 to Merges).foldLeft("regexp_replace(w, '(.)', '<\\1>', 'g')") {
      case (e, i) =>
        s"replace($e, (SELECT pair FROM b$i), (SELECT replace(pair, '><', '') FROM b$i))"
    }
    Map(
      "text_bpe_train" ->
        s"""WITH $trainCtes
           |$rows""".stripMargin,
      "text_bpe_encode" ->
        s"""WITH $trainCtes,
           |words AS (SELECT doc_id, w
           |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t
           |  WHERE w <> ''),
           |enc AS (SELECT doc_id,
           |  CASE WHEN regexp_full_match(w, '[a-z]+')
           |       THEN len($encExpr) - len(replace($encExpr, '<', ''))
           |       ELSE 1 END AS tok
           |  FROM words),
           |counts AS (SELECT doc_id, count(*) AS n_words, sum(tok) AS bpe_tokens
           |           FROM enc GROUP BY 1)
           |SELECT d.doc_id, COALESCE(c.n_words, 0)::BIGINT AS n_words,
           |  COALESCE(c.bpe_tokens, 0)::BIGINT AS bpe_tokens
           |FROM documents d LEFT JOIN counts c ON c.doc_id = d.doc_id""".stripMargin)
  }
}
