package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Sketch / approximate-query-processing operators over `documents`
  * (SURVEY §2.G): the three workhorse sketches of large-scale corpus
  * accounting — HyperLogLog distinct counting, count-min frequency
  * estimation, and Bloom membership — each built from the same
  * portable md5 hash words as the signature operators ([[Md5Bits]]),
  * so every register / counter / bit position is an exact integer the
  * DuckDB oracle replays bit-for-bit. Estimates derived from floats
  * (the HLL harmonic mean, fp rates) stay OUT of the oracle columns:
  * the query emits the exact integer sketch state, and the specs
  * compute the float estimate and assert the error bound.
  *
  * Why sketches at 100 TB: the exact answers these approximate each
  * need a corpus-sized shuffle (distinct → groupBy term; membership →
  * semi-join). The sketch state is CONSTANT-sized (HLL: m registers;
  * CMS: d×w counters; Bloom: m bits) and merges associatively, so at
  * scale each is one map-side-partial aggregation whose reduce state
  * fits in L2 — the same reason `approx_count_distinct` exists. These
  * operators keep the exact answer alongside at test scale so the
  * error contract is measured, not assumed.
  *
  * Scale notes (100 TB):
  *   - sketch_hll: groupBy(lang, bucket) max(rho) — 64 registers per
  *     language of partial-agg state; the corpus never shuffles, only
  *     (lang × 64) rows do. The exact-distinct companion IS the
  *     expensive path (kept for error measurement; drop it in
  *     production and the whole query is scan-speed).
  *   - sketch_cms: counters are computed from the TERM CENSUS (one
  *     vocabulary-sized groupBy), not by exploding the corpus 4× —
  *     count(j,pos) = Σ census-n over terms hashing to pos, which is
  *     the same integer by associativity.
  *   - sketch_bloom: the relational form (distinct position set +
  *     all-k-positions join) is the oracle-replayable skeleton; a
  *     production deployment packs the positions into a broadcast
  *     Array[Long] bitset probed by a codegen'd expression (the
  *     `might_contain` shape of Spark's own BloomFilterAggregate).
  *     The filter is sized FROM the build cardinality (m = next pow2
  *     of 8n → ~3 % fp at k=3), the real deployment pattern rather
  *     than a constant that saturates at scale; the sizing arithmetic
  *     is integer-exact (bit length of 8n−1), so the oracle agrees on
  *     m without any float log2.
  */
object Sketch {
  import Md5Bits._

  // ---- sketch_hll ----------------------------------------------------

  /** HLL geometry: p=6 → m=64 registers; the md5-p60 word splits into
    * a 6-bit bucket and a 54-bit field whose leading-zero count + 1 is
    * rho ∈ [1, 55]. Register sums are kept scaled by 2^55 so each term
    * 2^(55−rho) is an exact long (empty register ⇒ rho 0 ⇒ 2^55);
    * Σ ≤ 64·2^55 = 2^61 — no overflow, no floats. */
  private[graft] val HllP = 6
  private[graft] val HllM = 1 << HllP        // 64 registers
  private[graft] val FieldBits = 60 - HllP   // 54
  private[graft] val FieldPow = 1L << FieldBits

  /** Split a 60-bit hash column `h` into HLL (bucket, rho) — shared by
    * the batch census and the streaming cardinality gate (same code =
    * drift impossible, the stream_quality argument). */
  private[graft] def hllParts(df: DataFrame): DataFrame = df
    .withColumn("bucket", expr(s"h div ${FieldPow}L"))
    .withColumn("rest", expr(s"h % ${FieldPow}L"))
    .withColumn("rho",
      when(col("rest") === 0L, lit(FieldBits + 1))
        .otherwise(lit(FieldBits + 1) - length(bin(col("rest")))))

  /** Fold per-key register rows `(keys…, reg)` into the exact sketch
    * state `(keys…, m, occupied, sum_scaled)`. */
  private[graft] def hllSummary(regs: DataFrame, keys: Seq[String]): DataFrame =
    regs.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("occupied"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${FieldBits + 1} - reg)")).as("occ_sum"))
      .withColumn("sum_scaled",
        col("occ_sum") + (lit(HllM.toLong) - col("occupied")) * lit(1L << (FieldBits + 1)))
      .select(keys.map(col) :+ lit(HllM).as("m") :+ col("occupied") :+ col("sum_scaled"): _*)

  /** sketch_hll — per-language distinct-token estimate as exact HLL
    * register state: occupied register count and the 2^55-scaled
    * harmonic-mean denominator, with the exact distinct count kept
    * alongside so the error contract is measured (SketchSpec asserts
    * the standard-HLL estimate lands within 25 % — 3σ at m=64). */
  def sketchHll(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
    // leading zeros of the 54-bit field + 1; bin() strips leading
    // zeros in both engines, so rho = 55 - bit_length(rest)
    val hashed = hllParts(toks.withColumn("h", p60(col("term"))))
    val regs = hashed.groupBy(col("lang"), col("bucket"))
      .agg(max(col("rho")).as("reg"))
    val exact = toks.groupBy(col("lang"))
      .agg(count_distinct(col("term")).as("exact_distinct"))
    hllSummary(regs, Seq("lang")).join(exact, Seq("lang"))
      .select(col("lang"), col("m"), col("occupied"),
        col("sum_scaled"), col("exact_distinct"))
  }

  // ---- sketch_cms ----------------------------------------------------

  /** CMS geometry: d=4 rows × w=1024 counters; row hashes are the
    * Kirsch–Mitzenmacher family h_j = (hi32 + j·lo32) mod w over the
    * term's md5 words (same construction as the MinHash functions). */
  private[graft] val CmsD = 4
  private[graft] val CmsW = 1024L

  /** The d Kirsch–Mitzenmacher counter positions of a `term` column
    * (one row per (input row, j)) — shared by [[sketchCms]] and the
    * streaming heavy-hitter grid (stream_topk). */
  private[graft] def cmsPositions(df: DataFrame): DataFrame = df
    .withColumn("h1", hi32(col("term"))).withColumn("h2", lo32(col("term")))
    .withColumn("jp", explode(expr(
      s"transform(sequence(0, ${CmsD - 1}), j -> struct(j AS j, (h1 + j * h2) % ${CmsW}L AS pos))")))
    .select(df.columns.map(col) :+ col("jp.j").as("j") :+ col("jp.pos").as("pos"): _*)

  /** sketch_cms — count-min frequency estimation over the token
    * stream: build the d×w counter grid from the term census, probe it
    * with the exact top-20 terms, and emit estimate vs exact (the
    * one-sided overcount is the CMS contract; SketchSpec asserts
    * est ≥ exact on every probe). */
  def sketchCms(spark: SparkSession, dir: String): DataFrame = {
    val census = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      // census fans out into counters AND the probe top-k — checkpoint
      // the vocabulary-sized frame so the corpus explode runs once
      // (no cross-branch CSE; SURVEY §5 rule), freed before return
      .transform(graft.util.Checkpoints.compact(_, eager = true))
    def positions(df: DataFrame): DataFrame = cmsPositions(df)
    val counters = positions(census)
      .groupBy(col("j"), col("pos")).agg(sum(col("n")).as("c"))
    val probes = census.orderBy(col("n").desc, col("term")).limit(20)
    val out = positions(probes)
      .join(counters, Seq("j", "pos"))
      .groupBy(col("term"), col("n"))
      .agg(min(col("c")).as("cms_est"))
      .select(col("term"), col("n").as("n_exact"), col("cms_est"),
        (col("cms_est") - col("n")).as("overcount"))
      .transform(graft.util.Checkpoints.compact(_, eager = true))
    graft.util.Checkpoints.free(census)
    out
  }

  // ---- sketch_bloom --------------------------------------------------

  /** k=3 positions per key over m = next-pow2(8·n_build) bits
    * (~2.7 bits of the 8 used per hash; fp ≈ (1−e^(−3/8))^3 ≈ 3 %,
    * constant at any corpus size because m tracks n). */
  private val BloomK = 3

  /** sketch_bloom — Bloom membership of every document's text against
    * the build partition (doc_id % 3 ≠ 0): per-doc bloom verdict vs
    * exact membership, with false positives flagged. No false
    * negative is possible by construction (SketchSpec asserts it). */
  def sketchBloom(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val bt = docs.filter(col("doc_id") % 3 =!= 0).select(col("text")).distinct()
    // 1-row sizing: m = 2^bitlen(8n−1) — exact integer next-pow2
    val stats = bt.agg(count(lit(1)).as("n_build"))
      .withColumn("m_bits",
        expr("shiftleft(CAST(1 AS BIGINT), length(bin(8 * greatest(n_build, 1L) - 1)))"))
    def positions(df: DataFrame, keep: Seq[String]): DataFrame = df
      .crossJoin(broadcast(stats))
      .withColumn("h1", hi32(col("text"))).withColumn("h2", lo32(col("text")))
      .withColumn("pos", explode(expr(
        s"transform(sequence(0, ${BloomK - 1}), j -> (h1 + j * h2) % m_bits)")))
      .select((keep :+ "pos").map(col): _*)
    val bloomBits = positions(bt, Seq.empty).distinct() // ≤ m rows, grows with n — no broadcast hint
    val probed = positions(docs, Seq("doc_id"))
      .join(bloomBits.withColumn("hit", lit(1)), Seq("pos"), "left")
      .groupBy(col("doc_id"))
      .agg((min(coalesce(col("hit"), lit(0))) === 1).as("bloom_hit"))
    val actual = docs
      .join(bt.withColumn("member", lit(1)), Seq("text"), "left")
      .select(col("doc_id"), (coalesce(col("member"), lit(0)) === 1).as("actual"))
    probed.join(actual, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("bloom_hit"), col("actual"),
        (col("bloom_hit") && !col("actual")).as("is_fp"),
        col("n_build"), col("m_bits"))
  }

  /** sketch_histo — mergeable equi-width HISTOGRAM quantiles (the
    * fourth workhorse sketch: what approx_percentile keeps per
    * partition, in exact-integer form): per return-flag, l_quantity
    * bucketed into width-5 bins, each row the bin's count, running
    * cumulative, and whether the bin CONTAINS the p50 / p90 order
    * statistic (rank r_q = ceil(q·n) — pure integer arithmetic, the
    * sketch's quantile readout). The bin relation IS the mergeable
    * state: bins add associatively, so at 100 TB this is one
    * map-side-partial groupBy whose reduce state is |flags|×10 longs;
    * the window runs over the bins-sized frame, never the fact
    * table. */
  def sketchHisto(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, dir).select(
      col("l_returnflag").as("flag"),
      ((col("l_quantity").cast("long") - 1) / lit(5L)).cast("int").as("bin"))
    val h = li.groupBy(col("flag"), col("bin")).agg(count(lit(1)).as("n"))
    val cum = Window.partitionBy(col("flag")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("flag"))
    h.withColumn("cum_n", sum(col("n")).over(cum))
      .withColumn("total", sum(col("n")).over(tot))
      .withColumn("r50", expr("(total + 1) div 2"))
      .withColumn("r90", expr("(total * 9 + 9) div 10"))
      .select(col("flag"), col("bin"), col("n"), col("cum_n"),
        (col("cum_n") - col("n") < col("r50") && col("r50") <= col("cum_n")).as("is_p50_bin"),
        (col("cum_n") - col("n") < col("r90") && col("r90") <= col("cum_n")).as("is_p90_bin"))
  }

  // ---- registry ------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_hll"   -> (sketchHll _),
    "sketch_cms"   -> (sketchCms _),
    "sketch_histo" -> (sketchHisto _),
    "sketch_bloom" -> (sketchBloom _))

  val oracles: Map[String, String] = Map(
    "sketch_histo" ->
      """WITH h AS (SELECT l_returnflag AS flag,
        |    CAST((CAST(l_quantity AS BIGINT) - 1) // 5 AS INTEGER) AS bin,
        |    count(*) AS n
        |  FROM lineitem GROUP BY 1, 2),
        |w AS (SELECT flag, bin, n,
        |    CAST(sum(n) OVER (PARTITION BY flag ORDER BY bin) AS BIGINT) AS cum_n,
        |    CAST(sum(n) OVER (PARTITION BY flag) AS BIGINT) AS total
        |  FROM h)
        |SELECT flag, bin, n, cum_n,
        |  (cum_n - n < (total + 1) // 2 AND (total + 1) // 2 <= cum_n) AS is_p50_bin,
        |  (cum_n - n < (total * 9 + 9) // 10 AND (total * 9 + 9) // 10 <= cum_n)
        |    AS is_p90_bin
        |FROM w""".stripMargin,
    "sketch_hll" ->
      s"""WITH toks AS (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents),
         |h AS (SELECT lang, term, ${p60Sql("term")} AS h FROM toks),
         |f AS (SELECT lang, h // ${FieldPow} AS bucket, h % ${FieldPow} AS rest FROM h),
         |r AS (SELECT lang, bucket,
         |        CASE WHEN rest = 0 THEN ${FieldBits + 1}
         |             ELSE ${FieldBits + 1} - length(bin(rest)) END AS rho
         |      FROM f),
         |regs AS (SELECT lang, bucket, max(rho) AS reg FROM r GROUP BY 1, 2),
         |hll AS (SELECT lang, count(*) AS occupied,
         |          sum((1::BIGINT << (${FieldBits + 1} - reg))) AS occ_sum
         |        FROM regs GROUP BY 1),
         |ex AS (SELECT lang, count(DISTINCT term) AS exact_distinct FROM toks GROUP BY 1)
         |SELECT hll.lang, CAST($HllM AS INTEGER) AS m, occupied,
         |  (occ_sum + ($HllM - occupied) * (1::BIGINT << ${FieldBits + 1}))::BIGINT AS sum_scaled,
         |  exact_distinct
         |FROM hll JOIN ex ON hll.lang = ex.lang""".stripMargin,
    "sketch_cms" ->
      s"""WITH census AS (
         |  SELECT term, count(*) AS n
         |  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents) t
         |  GROUP BY 1),
         |pos AS (
         |  SELECT term, n, j,
         |    ((${hi32Sql("term")}) + j * (${lo32Sql("term")})) % $CmsW AS pos
         |  FROM census, range(0, $CmsD) r(j)),
         |counters AS (SELECT j, pos, sum(n) AS c FROM pos GROUP BY 1, 2),
         |probes AS (SELECT term, n FROM census ORDER BY n DESC, term LIMIT 20)
         |SELECT p.term, p.n AS n_exact, min(c.c)::BIGINT AS cms_est,
         |  (min(c.c) - p.n)::BIGINT AS overcount
         |FROM probes p
         |JOIN pos ON pos.term = p.term
         |JOIN counters c ON c.j = pos.j AND c.pos = pos.pos
         |GROUP BY p.term, p.n""".stripMargin,
    "sketch_bloom" ->
      s"""WITH docs AS (SELECT doc_id, text FROM documents),
         |bt AS (SELECT DISTINCT text FROM docs WHERE doc_id % 3 <> 0),
         |st AS (SELECT count(*) AS n_build,
         |         (1::BIGINT << length(bin(8 * greatest(count(*), 1) - 1))) AS m_bits
         |       FROM bt),
         |bpos AS (
         |  SELECT DISTINCT ((${hi32Sql("text")}) + j * (${lo32Sql("text")})) % m_bits AS pos
         |  FROM bt, st, range(0, $BloomK) r(j)),
         |probe AS (
         |  SELECT doc_id, ((${hi32Sql("text")}) + j * (${lo32Sql("text")})) % m_bits AS pos
         |  FROM docs, st, range(0, $BloomK) r(j)),
         |hit AS (
         |  SELECT doc_id,
         |    min(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) = 1 AS bloom_hit
         |  FROM probe LEFT JOIN bpos b USING (pos) GROUP BY 1),
         |act AS (
         |  SELECT doc_id, max(CASE WHEN bt.text IS NOT NULL THEN 1 ELSE 0 END) = 1 AS actual
         |  FROM docs LEFT JOIN bt ON docs.text = bt.text GROUP BY 1)
         |SELECT hit.doc_id, bloom_hit, actual,
         |  (bloom_hit AND NOT actual) AS is_fp, n_build, m_bits
         |FROM hit JOIN act ON hit.doc_id = act.doc_id CROSS JOIN st""".stripMargin)
}
