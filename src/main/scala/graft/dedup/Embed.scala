package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Embedding compression over `embeddings` (SURVEY §2.D) — int8
  * scalar quantization plus a similarity scan over the quantized
  * vectors: the storage/bandwidth half of ANN at scale. A 100 TB
  * float32 embedding store is 25 TB at int8 — the quantized scan is
  * what the first (recall-oriented) pass of a two-stage retrieval
  * pipeline reads, with exact re-ranking only on the surviving
  * candidates ([[Dedup.simTopkBruteforce]] is that second stage here).
  *
  * Everything stays hash-checkable: quantization is
  * `floor(x * scale + 0.5)` (explicit floor — Spark `round` half-even
  * vs DuckDB `round` half-away would diverge on exact .5 products),
  * the quantized dot/norms are EXACT integer sums (order-insensitive,
  * so any partitioning gives the same bits), and the only floating
  * steps are IEEE-exact: divisions, multiplies, and `sqrt` (correctly
  * rounded by IEEE 754, unlike `ln` — see [[Search]]).
  *
  * Scale notes: both operators are one narrow codegen'd pass per
  * vector (quantize) plus, for the scan, a broadcast of the tiny query
  * set against the quantized table — no shuffle at all on the corpus
  * side; at production scale the int8 table is the COLUMN you store,
  * so the scan reads a quarter of the float bytes.
  */
object Embed {

  /** Embeddings as double vectors (float→double widening is exact). */
  private def vecs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Per-vector symmetric int8 quantization: `scale = 127 / max|x|`,
    * `q_i = floor(x_i * scale + 0.5)` ∈ [-127, 127]. Kept as an array
    * column for composition ([[simTopkInt8]] consumes it). */
  private[dedup] def quantized(spark: SparkSession, dir: String): DataFrame =
    vecs(spark, dir)
      .withColumn("maxabs", expr("array_max(transform(v, x -> abs(x)))"))
      .filter(col("maxabs") > 0)
      .withColumn("scale", lit(127.0) / col("maxabs"))
      .withColumn("q", expr("transform(v, x -> CAST(floor(x * scale + 0.5e0) AS INT))"))

  /** embed_quantize — the quantized store, exploded to
    * (vec_id, pos, qv) rows with the per-vector scale and the integer
    * norm (so dequantization `qv / scale` and norm checks are
    * row-local). Exploded rather than an array column purely for the
    * gate's row-hash; the composition path keeps the array. */
  def embedQuantize(spark: SparkSession, dir: String): DataFrame =
    quantized(spark, dir)
      .withColumn("norm_sq", expr("aggregate(q, 0L, (acc, x) -> acc + CAST(x AS BIGINT) * CAST(x AS BIGINT))"))
      .select(col("vec_id"), col("scale"), col("norm_sq"), posexplode(col("q")).as(Seq("pos", "qv")))
      .select(col("vec_id"), col("pos"), col("qv"), col("scale"), col("norm_sq"))

  /** sim_topk_int8 — cosine top-5 neighbors for the query set
    * (vec_id < 10) computed entirely on the int8 vectors: integer dot
    * and norms (exact), one sqrt+divide per pair. The quantized
    * ranking is the cheap first stage; its disagreement vs the exact
    * [[Dedup.simTopkBruteforce]] ranking is the quantization error
    * (spec-measured overlap ≥ 4 of 5 in EmbedSpec). */
  def simTopkInt8(spark: SparkSession, dir: String): DataFrame =
    simTopkInt8Width(spark, dir, width = 5)

  /** sim_rerank — the two-stage retrieval composition end-to-end: the
    * int8 scan shortlists top-20 per query (cheap: quarter-width reads,
    * integer arithmetic), then ONLY those ≤ 20×|queries| candidates are
    * re-scored with the exact float cosine and cut to top-5. At scale
    * the first stage reads the int8 column of the whole store; the
    * second stage fetches float vectors for a candidate set that no
    * longer depends on corpus size — the standard recall-then-precision
    * funnel. Output ranks by the EXACT score, so quantization error
    * only costs recall (a true neighbor missing from the shortlist),
    * never precision of the returned ordering; the overlap spec in
    * EmbedSpec measures exactly that residual. */
  def simRerank(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    val shortlist = simTopkInt8Width(spark, dir, width = 20)
      .select(col("q_id"), col("neighbor"))
    val v = vecs(spark, dir)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("neighbor"))
    shortlist
      .join(v.select(col("vec_id").as("q_id"), col("v").as("vq")), Seq("q_id"))
      .join(v.select(col("vec_id").as("neighbor"), col("v").as("vn")), Seq("neighbor"))
      .withColumn("cosine", expr("cosine_sim(vq, vn)"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("neighbor"), col("cosine"), col("rk"))
  }

  /** [[simTopkInt8]] with a configurable shortlist width (the
    * recall/cost dial of the first stage). */
  private def simTopkInt8Width(spark: SparkSession, dir: String, width: Int): DataFrame = {
    val qz = quantized(spark, dir).select(col("vec_id"), col("q"))
    val qs = qz.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("q").as("qa"))
    val ts = qz.select(col("vec_id").as("neighbor"), col("q").as("qb"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine_q").desc, col("neighbor"))
    broadcast(qs).join(ts, col("q_id") =!= col("neighbor"))
      .withColumn("dot", expr(
        "aggregate(zip_with(qa, qb, (x, y) -> CAST(x AS BIGINT) * CAST(y AS BIGINT)), 0L, (acc, x) -> acc + x)"))
      .withColumn("na", expr("aggregate(qa, 0L, (acc, x) -> acc + CAST(x AS BIGINT) * CAST(x AS BIGINT))"))
      .withColumn("nb", expr("aggregate(qb, 0L, (acc, x) -> acc + CAST(x AS BIGINT) * CAST(x AS BIGINT))"))
      .withColumn("cosine_q", col("dot").cast("double") /
        (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= width)
      .select(col("q_id"), col("neighbor"), col("cosine_q"), col("rk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_quantize" -> (embedQuantize _),
    "sim_topk_int8"  -> (simTopkInt8 _),
    "sim_rerank"     -> (simRerank _))

  val oracles: Map[String, String] = {
    // DuckDB twin of `quantized`: FLOAT[] → DOUBLE elementwise, then
    // the same floor(x*scale + 0.5) tree. DuckDB lists are 1-based;
    // Spark posexplode emits 0-based pos, hence the `i - 1`.
    val qCte =
      """qz AS (
        |  SELECT vec_id, 127.0e0 / maxabs AS scale,
        |    list_transform(v, x -> CAST(floor(x * (127.0e0 / maxabs) + 0.5e0) AS INTEGER)) AS q
        |  FROM (
        |    SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS maxabs
        |    FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |          FROM embeddings))
        |  WHERE maxabs > 0)""".stripMargin
    Map(
      "embed_quantize" ->
        s"""WITH $qCte
           |SELECT vec_id,
           |  CAST(unnest(range(0, len(q))) AS INTEGER) AS pos,
           |  unnest(q) AS qv,
           |  scale,
           |  CAST(list_sum(list_transform(q, x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))) AS BIGINT) AS norm_sq
           |FROM qz""".stripMargin,
      "sim_rerank" ->
        // stage 1 = the sim_topk_int8 pipeline at width 20; stage 2
        // re-scores only the shortlist with the exact double cosine
        // (list_dot_product / sqrt folds proven bit-identical to the
        // native cosine_sim by the dedup_embedding oracle)
        s"""WITH $qCte,
           |vv AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
           |pairs AS (
           |  SELECT a.vec_id AS q_id, b.vec_id AS neighbor,
           |    CAST(list_sum(list_transform(range(1, len(a.q) + 1),
           |      i -> CAST(a.q[i] AS BIGINT) * CAST(b.q[i] AS BIGINT))) AS BIGINT) AS dot,
           |    CAST(list_sum(list_transform(a.q, x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))) AS BIGINT) AS na,
           |    CAST(list_sum(list_transform(b.q, x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))) AS BIGINT) AS nb
           |  FROM qz a JOIN qz b ON a.vec_id < 10 AND a.vec_id <> b.vec_id),
           |shortlist AS (
           |  SELECT q_id, neighbor,
           |    row_number() OVER (PARTITION BY q_id
           |      ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) DESC,
           |        neighbor) AS rk0
           |  FROM pairs QUALIFY rk0 <= 20),
           |rescored AS (
           |  SELECT s.q_id, s.neighbor,
           |    list_dot_product(qv.v, nv.v) / (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(nv.v, nv.v))) AS cosine
           |  FROM shortlist s
           |  JOIN vv qv ON qv.vec_id = s.q_id
           |  JOIN vv nv ON nv.vec_id = s.neighbor)
           |SELECT q_id, neighbor, cosine,
           |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor) AS INTEGER) AS rk
           |FROM rescored QUALIFY rk <= 5""".stripMargin,
      "sim_topk_int8" ->
        s"""WITH $qCte,
           |pairs AS (
           |  SELECT a.vec_id AS q_id, b.vec_id AS neighbor,
           |    CAST(list_sum(list_transform(range(1, len(a.q) + 1),
           |      i -> CAST(a.q[i] AS BIGINT) * CAST(b.q[i] AS BIGINT))) AS BIGINT) AS dot,
           |    CAST(list_sum(list_transform(a.q, x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))) AS BIGINT) AS na,
           |    CAST(list_sum(list_transform(b.q, x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))) AS BIGINT) AS nb
           |  FROM qz a JOIN qz b ON a.vec_id < 10 AND a.vec_id <> b.vec_id),
           |scored AS (
           |  SELECT q_id, neighbor,
           |    CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cosine_q
           |  FROM pairs)
           |SELECT q_id, neighbor, cosine_q,
           |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine_q DESC, neighbor) AS INTEGER) AS rk
           |FROM scored QUALIFY rk <= 5""".stripMargin)
  }
}
