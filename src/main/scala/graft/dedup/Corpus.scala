package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Corpus management (SURVEY §2.D): the two steps between scoring and
  * training — mixing (deterministic stratified sampling) and sharding
  * (token-budget packing). Both are thin declarative plans over
  * `documents`, and both are REPRODUCIBLE BY CONSTRUCTION: selection
  * and placement derive from content keys (md5 of the doc id, the doc
  * id ordering), never from `rand()` or partition iteration order —
  * rerunning the pipeline on any cluster layout yields byte-identical
  * corpora, which is what makes training-data builds auditable.
  *
  * Scale notes (100 TB):
  * - corpus_sample is a pure per-row filter (codegen'd md5 + integer
  *   compare against a bounded per-language threshold map): streams at
  *   scan speed, no shuffle at all.
  * - corpus_pack needs a running token sum in (lang, doc_id) order.
  *   Language cardinality is a handful, so `Window.partitionBy(lang)`
  *   alone would sort and scan each language's ENTIRE census in ONE
  *   task — the low-cardinality-key serializer trap (SURVEY §5). The
  *   implementation is the classic two-level distributed prefix sum:
  *   docs are windowed within (lang, doc_id div B) buckets — full
  *   parallelism, B docs per task — and only the per-bucket TOTALS
  *   (n/B rows) run through the per-language cumsum before being
  *   joined back as bucket offsets. Identical result to the
  *   single-window form (spec-asserted), no data-sized single-task
  *   sort anywhere; deeper nesting of the same shape covers any n.
  */
object Corpus {
  import Md5Bits._

  /** Per-language keep rates (numerator of rate × 2^60, exact):
    * downsample the dominant languages, keep the tail. A literal map —
    * the mixing spec a pipeline would load from config. */
  private val Scale60 = 1L << 60
  private val rates: Seq[(String, Long)] = Seq(
    "en" -> Scale60 / 4, // keep 25 %
    "de" -> Scale60 / 2) // keep 50 %
  private val defaultRate = Scale60 // keep all

  /** Generic deterministic stratified sampler — the library operator
    * behind [[corpusSample]]: keep a row iff the 60-bit md5 of its
    * `id` column (stringified) falls under its stratum's threshold
    * (rate numerators are exact `rate × 2^60` longs — integer
    * compare, no floating point, no RNG). The sample is a pure
    * function of (id, stratum): rerun-identical on any cluster
    * layout, and any engine with md5 replays it bit-for-bit. The
    * selection column `sample_key` is kept for auditability. */
  def stratifiedSample(df: DataFrame, stratum: String, id: Column,
      rateNums: Seq[(String, Long)], defaultNum: Long): DataFrame = {
    require(!df.columns.contains("sample_key"),
      "stratifiedSample reserves the output column name 'sample_key'; rename it on the input frame")
    // loud-failure guards (house convention): a duplicate stratum key
    // would silently shadow later entries in the CASE chain, and a
    // numerator outside [0, 2^60] silently clamps to drop-all/keep-all
    val dupKeys = rateNums.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }
    require(dupKeys.isEmpty, s"duplicate stratum keys: ${dupKeys.mkString(", ")}")
    (rateNums :+ ("<default>", defaultNum)).foreach { case (k, n) =>
      require(n >= 0L && n <= Scale60,
        s"stratum '$k' rate numerator $n outside [0, 2^60] (exact rate = numerator / 2^60)")
    }
    // register into the FRAME's session, not the thread's active one —
    // a caller on a custom thread pool or a newSession() clone has no
    // usable active-session registry
    graft.functions.GraftFunctions.registerAll(df.sparkSession)
    val thr: Column = rateNums.foldRight(lit(defaultNum)) { case ((l, r), acc) =>
      when(col(stratum) === l, lit(r)).otherwise(acc)
    }
    df.withColumn("sample_key", p60(id.cast("string")))
      .filter(col("sample_key") < thr)
  }

  /** corpus_sample — deterministic stratified sampling for corpus
    * mixing over `documents`: downsample en to 25 %, de to 50 %, keep
    * the long tail whole. [[stratifiedSample]] instantiated on
    * (lang, doc_id). */
  def corpusSample(spark: SparkSession, dir: String): DataFrame =
    stratifiedSample(
      Tables.documents(spark, dir).select(col("doc_id"), col("lang"), col("source")),
      stratum = "lang", id = col("doc_id"), rateNums = rates, defaultNum = defaultRate)

  /** corpus_pack — greedy token-budget shard packing: docs are laid
    * out in deterministic (doc_id) order within each language, and a
    * doc lands in the shard where its token window STARTS
    * (shard = prefix-tokens-before-it div budget). Shards overflow by
    * at most one document — the standard greedy packing contract —
    * and placement is a pure function of the ordered token census.
    *
    * Prefix-sum shape (the 100 TB fix for the per-language window
    * serializer): level 1 cumsums within (lang, doc_id div B) buckets
    * — every task touches ≤ B docs regardless of language skew;
    * level 2 cumsums the per-bucket totals (n/B rows — census-sized)
    * per language and joins the EXCLUSIVE bucket offset back on
    * (lang, bucket). cum = bucket offset + within-bucket cumsum, exact
    * long arithmetic, identical to the single-window form. The offset
    * frame grows as n/B so it carries no broadcast hint (AQE
    * broadcasts while it fits); B dials task size, and a third level
    * of the same shape covers any census the level-2 window can't
    * sort in one task. */
  def corpusPack(spark: SparkSession, dir: String): DataFrame = {
    val budget = 2000L
    val bucketDocs = 1000L // B: level-1 task size in docs
    val wIn = Window.partitionBy(col("lang"), col("bkt")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOff = Window.partitionBy(col("lang")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("bkt", expr(s"doc_id div ${bucketDocs}L"))
    val offsets = base.groupBy(col("lang"), col("bkt"))
      .agg(sum(col("n_tokens")).as("tot"))
      .withColumn("off", sum(col("tot")).over(wOff) - col("tot"))
      .select(col("lang"), col("bkt"), col("off"))
    base
      .withColumn("cum_in", sum(col("n_tokens")).over(wIn))
      .join(offsets, Seq("lang", "bkt"))
      .withColumn("cum", col("off") + col("cum_in"))
      .withColumn("shard_idx", expr(s"(cum - n_tokens) div ${budget}L"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("shard_idx"),
        concat_ws("-", col("lang"), col("shard_idx")).as("shard"))
  }

  /** Target mixture caps for [[corpusMix]] (exact rationals num/den):
    * each language's kept mass is capped at `num/den` of the ORIGINAL
    * corpus size. Languages without a cap keep everything (cap 1/1 —
    * share·N/cnt ≥ 1 always). The config a mixing run loads. */
  private val mixCaps: Seq[(String, Long, Long)] = Seq(
    ("en", 1L, 4L), // en may fill at most 25 % of the original total
    ("es", 1L, 10L)) // es at most 10 %

  /** corpus_mix — census-driven mixture enforcement: downsample each
    * language to its target share cap, with the keep rate DERIVED from
    * the data (rate_l = min(1, share_l·N / cnt_l)) rather than
    * hand-set as in [[corpusSample]]. This is the actual mixing step
    * of a training-data build — the operator reads the corpus twice:
    * once to census it, once to filter it.
    *
    * Determinism at any scale: the accept decision is
    * `key·den_l·cnt_l < num_l·N·2^60` in EXACT integer arithmetic
    * (Spark decimal(38,0), DuckDB HUGEINT — ~1e31 max against 1e38
    * headroom), where `key` is the 60-bit md5 of the doc id. No
    * division, no floating point, no RNG: the kept set is a pure
    * function of (census, config, doc ids), rerun-identical and
    * replayable bit-for-bit by any engine with md5.
    *
    * Scale shape: the census is a map-side-partial groupBy producing a
    * LANGUAGE-dictionary-sized frame — the one broadcast here is that
    * bounded rate table (house rule), never document data; the filter
    * pass is then a pure per-row projection at scan speed. */
  def corpusMix(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("lang"), col("source"))
    val numC = mixCaps.foldRight(lit(1L)) { case ((l, n, _), acc) =>
      when(col("lang") === l, lit(n)).otherwise(acc) }
    val denC = mixCaps.foldRight(lit(1L)) { case ((l, _, d), acc) =>
      when(col("lang") === l, lit(d)).otherwise(acc) }
    val rates = docs.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
      .crossJoin(docs.agg(count(lit(1)).as("total"))) // |langs| × 1 — bounded
      .select(col("lang"), col("cnt"), col("total"), numC.as("num"), denC.as("den"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    docs.withColumn("sample_key", p60(col("doc_id").cast("string")))
      .join(broadcast(rates), Seq("lang"))
      .filter(dec(col("sample_key")) * dec(col("den")) * dec(col("cnt")) <
        dec(col("num")) * dec(col("total")) * dec(lit(Scale60)))
      .select(col("doc_id"), col("lang"), col("source"), col("sample_key"))
  }

  /** corpus_filter — the end-to-end per-document keep/drop decision a
    * training-data build actually executes, composed from the proven
    * stages: C4-class quality gate ([[Text.textQuality]]), language
    * agreement ([[Text.textLangid]]), Gopher-class repetition
    * ([[Text.textRepetition]]), benchmark decontamination
    * ([[Text.textContamination]]), and exact-dup canonicalization
    * ([[Dedup.dedupExact]]). One row per document with each stage's
    * verdict, the final `keep`, and a `reason` code (first failing
    * stage in pipeline order) — the audit trail a data build ships.
    *
    * Scale shape: nothing new — every input is one of the bounded
    * stages above, joined on doc_id (and the md5 hash for the dup
    * stage). Documents shorter than 2 words have no repetition row and
    * fail that stage (they fail the quality gate anyway); only corpus
    * docs (id ≥ 25) can be contamination-flagged, matching the
    * declared eval split. A fused single-scan variant would fold the
    * three per-row stages into one projection; the composition here
    * deliberately reuses the graded operators unchanged. */
  def corpusFilter(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("h"))
    val q = Text.textQuality(spark, dir).select(col("doc_id"), col("keep").as("q_ok"))
    val l = Text.textLangid(spark, dir).select(col("doc_id"),
      (col("pred_lang") === col("declared_lang")).as("lang_ok"))
    val r = Text.textRepetition(spark, dir).select(col("doc_id"), col("keep").as("rep_ok"))
    val cont = Text.textContamination(spark, dir).select(col("doc_id")).distinct()
      .withColumn("contaminated", lit(true))
    val keepers = Dedup.dedupExact(spark, dir).select(col("h"), col("keep_id"))
    docs
      .join(q, Seq("doc_id"))
      .join(l, Seq("doc_id"))
      .join(r, Seq("doc_id"), "left_outer")
      .join(cont, Seq("doc_id"), "left_outer")
      .join(keepers, Seq("h"))
      .select(col("doc_id"), col("q_ok"), col("lang_ok"),
        coalesce(col("rep_ok"), lit(false)).as("rep_ok"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"),
        (col("doc_id") === col("keep_id")).as("is_canonical"))
      .withColumn("keep",
        col("q_ok") && col("lang_ok") && col("rep_ok") &&
          !col("contaminated") && col("is_canonical"))
      .withColumn("reason",
        when(!col("q_ok"), "quality")
          .when(!col("lang_ok"), "language")
          .when(!col("rep_ok"), "repetition")
          .when(col("contaminated"), "contamination")
          .when(!col("is_canonical"), "duplicate")
          .otherwise("ok"))
  }

  /** [[corpusShuffle]] geometry: epochs to emit, docs per batch, and
    * the shuffle-key range per level-1 bucket (p60 keys are uniform on
    * [0, 2^60), so dividing by 2^46 yields ≤ 2^14 balanced buckets —
    * each level-1 task sorts ~n/16384 docs regardless of corpus
    * size). */
  private val ShuffleEpochs = 2
  private val BatchSize = 64L
  private val KeyBktPow = 1L << 46

  /** corpus_shuffle — the data loader's deterministic epoch shuffle:
    * each epoch is a fresh global permutation (order by
    * md5(epoch|doc_id)) cut into fixed-size training batches. md5
    * replaces the RNG: the permutation is a pure function of
    * (epoch, doc ids) — rerun-identical on any cluster layout, and
    * every engine with md5 replays it, which is what makes a training
    * run's data order AUDITABLE (batch k of epoch e is recomputable
    * forever).
    *
    * Scale shape: a naive `row_number() OVER (ORDER BY key)` is a
    * single-task global sort. The global index is instead the same
    * two-level prefix sum as [[corpusPack]]: level 1 numbers rows
    * within (epoch, key div 2^46) buckets — the md5 key is uniform,
    * so buckets are balanced and each task sorts ~n/2^14 docs; level
    * 2 cumsums the per-bucket counts (census-sized) into exclusive
    * offsets joined back on (epoch, bucket).
    *
    * The keyed frame feeds both the offset census and the final join
    * WITHOUT a checkpoint — deliberate, same call as [[corpusPack]]:
    * the census branch reduces map-side immediately, so the recompute
    * costs one narrow scan + md5 pass, while a checkpoint would pin a
    * corpus-row-count frame in cluster storage. Checkpoints are for
    * frames SMALLER than their recompute (vocab/census), not
    * corpus-sized ones. */
  def corpusShuffle(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    val wIn = Window.partitionBy(col("epoch"), col("kbkt"))
      .orderBy(col("skey"), col("doc_id"))
    val wOff = Window.partitionBy(col("epoch")).orderBy(col("kbkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val keyed = Tables.documents(spark, dir).select(col("doc_id"))
      .withColumn("epoch", explode(array((1 to ShuffleEpochs).map(lit): _*)))
      .withColumn("skey",
        p60(concat(col("epoch").cast("string"), lit("|"), col("doc_id").cast("string"))))
      .withColumn("kbkt", expr(s"skey div ${KeyBktPow}L"))
    val offsets = keyed.groupBy(col("epoch"), col("kbkt"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("off", sum(col("cnt")).over(wOff) - col("cnt"))
      .select(col("epoch"), col("kbkt"), col("off"))
    keyed
      .withColumn("rn", row_number().over(wIn))
      .join(offsets, Seq("epoch", "kbkt"))
      .withColumn("global_idx", col("off") + col("rn") - 1)
      .select(col("epoch"), col("doc_id"), col("skey"), col("global_idx"),
        expr(s"global_idx div ${BatchSize}L").as("batch_id"))
  }

  /** corpus_stats — the per-(source, lang) census a mixture planner
    * reads BEFORE setting corpus_mix caps: document / whitespace-token
    * / char volumes, distinct-text count (md5 of the text — the
    * dedup_exact key, so `n_docs − n_unique_texts` is the exact-dup
    * overhang per cell), and each cell's share of the corpus token
    * total. One scan + one map-side-partial groupBy; the grand total
    * is a 1-row broadcast (never a single-partition window). Every
    * column is an exact integer except the share — one division of
    * two exact longs, bit-deterministic, so the frame stays
    * hash-gated. At 100 TB this is the nightly corpus census: cost =
    * one pass over `documents`, output = sources × languages rows.
    * The cell census is localCheckpointed (cell-count-sized) because
    * BOTH the grand-total aggregate and the crossJoin input read it —
    * un-materialized, the documents scan + groupBy would execute twice
    * unless AQE exchange reuse happened to fire (round-9 ADVICE: the
    * one-scan claim was plan-dependent; now it's structural). */
  def corpusStats(spark: SparkSession, dir: String): DataFrame = {
    val cell = Tables.documents(spark, dir)
      .select(col("source"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("toks"),
        length(col("text")).cast("long").as("chars"),
        md5(col("text")).as("h"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_ws_tokens"),
        sum(col("chars")).as("n_chars"),
        countDistinct(col("h")).as("n_unique_texts"))
      .transform(graft.util.Checkpoints.compact(_, eager = true))
    val total = cell.agg(sum(col("n_ws_tokens")).as("tot_tokens"))
    cell.crossJoin(broadcast(total))
      .withColumn("token_share",
        col("n_ws_tokens").cast("double") / col("tot_tokens").cast("double"))
      .drop("tot_tokens")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_sample"  -> (corpusSample _),
    "corpus_pack"    -> (corpusPack _),
    "corpus_mix"     -> (corpusMix _),
    "corpus_shuffle" -> (corpusShuffle _),
    "corpus_stats"   -> (corpusStats _),
    "corpus_filter"  -> (corpusFilter _))

  val oracles: Map[String, String] = {
    val thrSql = rates.foldRight(defaultRate.toString) { case ((l, r), acc) =>
      s"CASE WHEN lang = '$l' THEN $r ELSE $acc END"
    }
    Map(
      // the census replays exactly: len(string_split) is the proven
      // whitespace-token twin (text_tokens), md5 is bit-identical, the
      // sums are exact integers (HUGEINT → BIGINT casts per the gate
      // convention), and the share is one BIGINT/BIGINT division in
      // double — deterministic in both engines
      "corpus_stats" ->
        """WITH d AS (SELECT source, lang,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
          |    CAST(length(text) AS BIGINT) AS chars,
          |    md5(text) AS h
          |  FROM documents),
          |cell AS (SELECT source, lang,
          |    count(*) AS n_docs,
          |    CAST(sum(toks) AS BIGINT) AS n_ws_tokens,
          |    CAST(sum(chars) AS BIGINT) AS n_chars,
          |    count(DISTINCT h) AS n_unique_texts
          |  FROM d GROUP BY source, lang)
          |SELECT source, lang, n_docs, n_ws_tokens, n_chars, n_unique_texts,
          |  CAST(n_ws_tokens AS DOUBLE) /
          |    CAST((SELECT CAST(sum(n_ws_tokens) AS BIGINT) FROM cell) AS DOUBLE)
          |    AS token_share
          |FROM cell""".stripMargin,
      "corpus_sample" ->
        s"""SELECT doc_id, lang, source,
           |  ${p60Sql("doc_id::VARCHAR")} AS sample_key
           |FROM documents
           |WHERE ${p60Sql("doc_id::VARCHAR")} < $thrSql""".stripMargin,
      "corpus_mix" -> {
        val numSql = mixCaps.foldRight("1") { case ((l, n, _), acc) =>
          s"CASE WHEN lang = '$l' THEN $n ELSE $acc END" }
        val denSql = mixCaps.foldRight("1") { case ((l, _, d), acc) =>
          s"CASE WHEN lang = '$l' THEN $d ELSE $acc END" }
        s"""WITH rates AS (
           |  SELECT lang, count(*) AS cnt,
           |    (SELECT count(*) FROM documents) AS total,
           |    $numSql AS num, $denSql AS den
           |  FROM documents GROUP BY lang)
           |SELECT d.doc_id, d.lang, d.source,
           |  ${p60Sql("d.doc_id::VARCHAR")} AS sample_key
           |FROM documents d JOIN rates r ON r.lang = d.lang
           |WHERE ${p60Sql("d.doc_id::VARCHAR")}::HUGEINT * r.den * r.cnt
           |      < r.num::HUGEINT * r.total * ${Scale60}::HUGEINT""".stripMargin
      },
      "corpus_filter" ->
        s"""WITH q AS (${Text.oracles("text_quality")}),
           |l AS (${Text.oracles("text_langid")}),
           |r AS (${Text.oracles("text_repetition")}),
           |cta AS (${Text.oracles("text_contamination")}),
           |e AS (${Dedup.oracles("dedup_exact")}),
           |d AS (SELECT doc_id, md5(text) AS h FROM documents),
           |base AS (
           |  SELECT d.doc_id, q.keep AS q_ok,
           |    (l.pred_lang = l.declared_lang) AS lang_ok,
           |    coalesce(r.keep, false) AS rep_ok,
           |    (cby.doc_id IS NOT NULL) AS contaminated,
           |    (d.doc_id = e.keep_id) AS is_canonical
           |  FROM d
           |  JOIN q USING (doc_id)
           |  JOIN l USING (doc_id)
           |  LEFT JOIN r USING (doc_id)
           |  LEFT JOIN (SELECT DISTINCT doc_id FROM cta) cby USING (doc_id)
           |  JOIN e ON d.h = e.h)
           |SELECT doc_id, q_ok, lang_ok, rep_ok, contaminated, is_canonical,
           |  (q_ok AND lang_ok AND rep_ok AND NOT contaminated AND is_canonical) AS keep,
           |  CASE WHEN NOT q_ok THEN 'quality'
           |       WHEN NOT lang_ok THEN 'language'
           |       WHEN NOT rep_ok THEN 'repetition'
           |       WHEN contaminated THEN 'contamination'
           |       WHEN NOT is_canonical THEN 'duplicate'
           |       ELSE 'ok' END AS reason
           |FROM base""".stripMargin,
      "corpus_shuffle" ->
        s"""WITH k AS (
           |  SELECT CAST(epoch AS INTEGER) AS epoch, doc_id,
           |    ${p60Sql("CAST(epoch AS VARCHAR)||'|'||CAST(doc_id AS VARCHAR)")} AS skey
           |  FROM documents, range(1, ${ShuffleEpochs + 1}) r(epoch)),
           |g AS (SELECT epoch, doc_id, skey,
           |        row_number() OVER (PARTITION BY epoch ORDER BY skey, doc_id) - 1 AS gi
           |      FROM k)
           |SELECT epoch, doc_id, skey, gi::BIGINT AS global_idx,
           |  (gi // $BatchSize)::BIGINT AS batch_id FROM g""".stripMargin,
      "corpus_pack" ->
        """WITH t AS (
          |  SELECT doc_id, lang,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          |  FROM documents
          |), c AS (
          |  SELECT doc_id, lang, n_tokens,
          |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
          |  FROM t)
          |SELECT doc_id, lang, n_tokens,
          |  CAST((cum - n_tokens) // 2000 AS BIGINT) AS shard_idx,
          |  lang || '-' || CAST((cum - n_tokens) // 2000 AS BIGINT)::VARCHAR AS shard
          |FROM c""".stripMargin)
  }
}
