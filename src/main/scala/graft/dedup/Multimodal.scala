package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal column plumbing (SURVEY §2.D `mm_meta`): treat media
  * payloads as opaque `binary` columns with typed metadata, and run
  * the decode/feature-extract stage as a batched per-partition pass —
  * the exact shape a real image/audio decoder plugs into.
  *
  * The decoder itself is STUBBED (this container has no media libs):
  * `fakeDecode` is a deterministic stand-in that consumes the payload
  * bytes and emits fixed-shape features. Everything around it — binary
  * column, metadata struct, partition-batched iterator, output schema
  * — is the real production plumbing.
  *
  * Scale notes: the decode pass is `mapPartitions` over an Iterator —
  * constant memory per partition, no collect, no per-row JNI setup
  * (a real decoder would init once per partition, exactly where the
  * comment marks). Payload bytes never hit the driver.
  */
object Multimodal {

  final case class MmRecord(doc_id: Long, fmt: String, payload: Array[Byte])
  final case class MmFeature(doc_id: Long, fmt: String, n_bytes: Int,
      width: Int, height: Int, checksum: Long)

  /** Deterministic decoder stub — replace with the real JNI/library
    * call; signature (digest context + bytes in, fixed-shape features
    * out) is what a real decoder satisfies. Features derive from the
    * 60-bit md5 prefix of the payload (the same word
    * [[graft.functions.Md5Long]] exposes to SQL, non-negative by
    * construction), so unlike a real decode the stub is EXACTLY
    * replayable by the DuckDB oracle — and since md5 hashes the raw
    * bytes and `payload` is the UTF-8 encoding of `text`, the replay
    * holds for ANY text, no ASCII assumption. */
  private def fakeDecode(md: java.security.MessageDigest,
      payload: Array[Byte]): (Int, Int, Long) = {
    md.reset()
    val d = md.digest(payload)
    var cs = 0L
    var i = 0
    while (i < 8) { cs = (cs << 8) | (d(i) & 0xffL); i += 1 }
    cs >>>= 4 // first 60 bits of the digest: md5_p60(payload)
    val width = 320 + (cs % 1601).toInt
    val height = 240 + ((cs / 7) % 841).toInt
    (width, height, cs)
  }

  /** Staging projection shared by both multimodal operators: binary
    * payload + typed metadata, one row per media object. */
  private def records(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        concat(lit("img/"), col("source")).as("fmt"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MmRecord]
  }

  /** mm_meta — binary payload + metadata → per-partition batched
    * "decode" → typed feature rows. */
  def mmMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    records(spark, dir).mapPartitions { it =>
      // once-per-partition decoder init (the real codec goes here)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val (w, h, cs) = fakeDecode(md, r.payload)
        MmFeature(r.doc_id, r.fmt, r.payload.length, w, h, cs)
      }
    }.toDF()
  }

  final case class MmFrame(doc_id: Long, frame_idx: Int, frame_bytes: Int, frame_sig: String)

  private val frameLen = 200
  private val maxFrames = 8

  /** mm_framesample — the 1→N multimodal shape (video frame sampling):
    * each payload fans out to up to [[maxFrames]] fixed-stride frames
    * via a flatMap-style `mapPartitions` pass with once-per-partition
    * "decoder" init (here a MessageDigest; a real frame grabber
    * initializes its codec in the same slot). Complements [[mmMeta]]'s
    * 1→1 map shape; together they are the two batched-imperative
    * stages a media pipeline needs.
    *
    * Unlike a real decoder, the frame "signature" is md5 of the frame's
    * byte slice — deliberately, so this imperative stage is still
    * EXACTLY replayable by the DuckDB oracle (payload = UTF-8 of text,
    * ASCII ⇒ byte slices == char slices): the plumbing is graded
    * hash-checked, not rows-only. */
  def mmFrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    records(spark, dir).mapPartitions { it =>
      // once-per-partition decoder init (the real codec goes here)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { r =>
        // empty payloads emit no frames (matches the oracle: Java's
        // (0-1)/frameLen truncates to 0 while SQL floor-division gives
        // -1, so the guard keeps both engines aligned on the edge)
        val n = if (r.payload.isEmpty) 0
          else math.min(maxFrames, 1 + (r.payload.length - 1) / frameLen)
        (0 until n).iterator.map { i =>
          val off = i * frameLen
          val len = math.min(frameLen, r.payload.length - off)
          md.reset()
          md.update(r.payload, off, len)
          MmFrame(r.doc_id, i, len, md.digest().map("%02x".format(_)).mkString)
        }
      }
    }.toDF()
  }

  /** mm_dedup — exact duplicate detection on the BINARY payload (the
    * first dedup stage every multimodal pipeline runs: byte-identical
    * images/audio recur constantly in crawls): md5 of the raw bytes,
    * one map-side-partial groupBy, canonical = min doc_id. The hash
    * is computed on the binary column itself — the decode stub never
    * runs, which is the point: exact dedup happens BEFORE any
    * expensive decoding, on bytes the scan already read. Per-format
    * censuses ride along (fmt is in the key's payload group). */
  def mmDedup(spark: SparkSession, dir: String): DataFrame =
    records(spark, dir).toDF()
      .select(col("doc_id"), col("fmt"), md5(col("payload")).as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"),
        countDistinct(col("fmt")).as("n_formats"))

  /** [[mmShard]] byte budget per shard. */
  private val ShardBytes = 4096L
  private val ShardBktDocs = 1000L

  /** mm_shard — WebDataset-style shard packing for binary payloads:
    * each media object gets a (shard, byte_offset) address from the
    * per-format byte prefix sum — greedy placement where the object's
    * byte window STARTS (shards overflow by ≤ 1 object, the
    * corpus_pack contract), and the WITHIN-shard offset is what makes
    * a packed shard randomly addressable (the tar-index a data loader
    * seeks by). Same two-level distributed prefix sum as corpus_pack:
    * format cardinality is small, so the level-1 window runs within
    * (fmt, doc_id div B) buckets and only bucket totals cumsum per
    * format. `base` feeds the offset census and the join without a
    * checkpoint — the census reduces map-side immediately, and
    * pinning a corpus-row-count frame would cost more than the narrow
    * rescan (the corpus_pack/corpus_shuffle call). */
  def mmShard(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wIn = Window.partitionBy(col("fmt"), col("bkt")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOff = Window.partitionBy(col("fmt")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = records(spark, dir).toDF()
      .select(col("doc_id"), col("fmt"), length(col("payload")).cast("long").as("n_bytes"))
      .withColumn("bkt", expr(s"doc_id div ${ShardBktDocs}L"))
    val offsets = base.groupBy(col("fmt"), col("bkt"))
      .agg(sum(col("n_bytes")).as("tot"))
      .withColumn("off", sum(col("tot")).over(wOff) - col("tot"))
      .select(col("fmt"), col("bkt"), col("off"))
    base
      .withColumn("cum_in", sum(col("n_bytes")).over(wIn))
      .join(offsets, Seq("fmt", "bkt"))
      .withColumn("start", col("off") + col("cum_in") - col("n_bytes"))
      .withColumn("shard_idx", expr(s"start div ${ShardBytes}L"))
      .select(col("doc_id"), col("fmt"), col("n_bytes"), col("shard_idx"),
        (col("start") - col("shard_idx") * lit(ShardBytes)).as("byte_offset"),
        concat_ws("-", col("fmt"), col("shard_idx")).as("shard"))
  }

  /** [[mmNearDup]] chunking: 64 payload bytes per chunk (= 128 hex
    * chars), near-dup at ≥ 3 shared aligned chunks. */
  private val ChunkBytes = 64
  private val NearDupMinShared = 3

  /** mm_near_dup — NEAR-duplicate binary payloads via aligned
    * fixed-size chunk hashes (the block-dedup / CTPH-lite baseline):
    * the payload splits into 64-byte chunks, each chunk hashes, and
    * two payloads are near-dups when ≥ 3 chunks agree AT THE SAME
    * OFFSET. Pair generation is BLOCKED on (chunk index, chunk hash)
    * — only byte-identical aligned content ever meets in a bucket, so
    * the join is the bounded LSH-band shape, never all-pairs (a
    * pathological boilerplate chunk is the documented skew case —
    * salt or drop top-frequency chunks like the MinHash bands).
    * Chunks hash through the payload's HEX rendering (2 chars/byte,
    * pure ASCII) so the DuckDB oracle replays byte-exactly for ANY
    * payload — this engine's md5 sees exactly the bytes DuckDB's
    * does, no charset assumption (unlike substring-on-text, which
    * slices characters). Fixed-size chunking is shift-SENSITIVE: an
    * insertion misaligns everything after it — the scale path for
    * shift-resistant matching is content-defined chunk boundaries
    * (FastCDC), which changes only the chunker, not this join. */
  def mmNearDup(spark: SparkSession, dir: String): DataFrame = {
    val recs = records(spark, dir).toDF()
      .select(col("doc_id"), hex(col("payload")).as("hexp"))
      .withColumn("n_chunks",
        expr(s"(length(hexp) + ${2 * ChunkBytes - 1}) div ${2 * ChunkBytes}"))
      .filter(col("n_chunks") > 0)
    val chunks = recs
      .select(col("doc_id"), col("n_chunks"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("idx"), col("hexp"))
      .select(col("doc_id"), col("n_chunks"), col("idx"),
        md5(encode(expr(s"substring(hexp, CAST(idx * ${2 * ChunkBytes} + 1 AS INT), ${2 * ChunkBytes})"),
          "UTF-8")).as("ch"))
    chunks.as("a").join(chunks.as("b"),
        col("a.idx") === col("b.idx") && col("a.ch") === col("b.ch") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n_chunks").as("n_chunks_a"), col("b.n_chunks").as("n_chunks_b"))
      .agg(count(lit(1)).as("shared_chunks"))
      .filter(col("shared_chunks") >= NearDupMinShared)
      .select(col("doc_a"), col("doc_b"), col("shared_chunks"),
        col("n_chunks_a"), col("n_chunks_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta"        -> (mmMeta _),
    "mm_framesample" -> (mmFrameSample _),
    "mm_dedup"       -> (mmDedup _),
    "mm_near_dup"    -> (mmNearDup _),
    "mm_shard"       -> (mmShard _))

  /** Both multimodal stages replay exactly in DuckDB. mm_meta's stub
    * features derive from md5_p60 of the payload — md5 hashes raw
    * bytes, and DuckDB's md5(text) hashes the same UTF-8 bytes the
    * Spark side encodes, so no charset assumption is needed there.
    * mm_framesample's oracle DOES slice text by CHARACTERS while the
    * Spark side slices the UTF-8 BYTE payload — equal only for ASCII,
    * so that oracle ENFORCES the assumption: a non-ASCII document
    * raises a loud error() instead of silently hash-mismatching the
    * gate. */
  val oracles: Map[String, String] = Map(
    "mm_meta" -> {
      val p60 = "('0x'||substr(md5(text),1,15))::BIGINT"
      s"""SELECT doc_id, 'img/' || source AS fmt,
         |  CAST(strlen(text) AS INTEGER) AS n_bytes,
         |  CAST(320 + $p60 % 1601 AS INTEGER) AS width,
         |  CAST(240 + ($p60 // 7) % 841 AS INTEGER) AS height,
         |  $p60 AS checksum
         |FROM documents""".stripMargin
    },
    // the hex rendering is byte-exact on both engines (DuckDB hex()
    // and Spark hex() both emit uppercase, 2 chars per byte), so the
    // aligned-chunk hashes agree for ANY payload bytes
    "mm_near_dup" ->
      s"""WITH r AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
         |n AS (SELECT doc_id, hx,
         |        (length(hx) + ${2 * 64 - 1}) // ${2 * 64} AS n_chunks FROM r
         |      WHERE length(hx) > 0),
         |c0 AS (
         |  SELECT doc_id, n_chunks,
         |    unnest(list_transform(range(0, n_chunks), i -> struct_pack(
         |      idx := i, ch := md5(substring(hx, i*${2 * 64}+1, ${2 * 64}))))) AS u
         |  FROM n),
         |c AS (SELECT doc_id, n_chunks, u.idx AS idx, u.ch AS ch FROM c0)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  count(*) AS shared_chunks,
         |  min(a.n_chunks) AS n_chunks_a, min(b.n_chunks) AS n_chunks_b
         |FROM c a JOIN c b ON a.idx = b.idx AND a.ch = b.ch AND a.doc_id < b.doc_id
         |GROUP BY 1, 2
         |HAVING count(*) >= 3""".stripMargin,
    // md5 of the payload bytes = md5 of the UTF-8 text (the payload IS
    // the UTF-8 encoding — same bytes, no charset assumption)
    "mm_dedup" ->
      """SELECT md5(text) AS h, count(*) AS n_copies, min(doc_id) AS keep_id,
        |  count(DISTINCT 'img/' || source) AS n_formats
        |FROM documents GROUP BY 1""".stripMargin,
    "mm_shard" ->
      s"""WITH t AS (
         |  SELECT doc_id, 'img/' || source AS fmt,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, fmt, n_bytes,
         |    CAST(sum(n_bytes) OVER (PARTITION BY fmt ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_bytes AS start
         |  FROM t)
         |SELECT doc_id, fmt, n_bytes,
         |  CAST(start // $ShardBytes AS BIGINT) AS shard_idx,
         |  CAST(start - (start // $ShardBytes) * $ShardBytes AS BIGINT) AS byte_offset,
         |  fmt || '-' || (start // $ShardBytes)::VARCHAR AS shard
         |FROM c""".stripMargin,
    "mm_framesample" ->
      s"""WITH d AS (SELECT doc_id,
         |        CASE WHEN strlen(text) = length(text) THEN text
         |             ELSE error('mm_framesample oracle assumes ASCII text (byte slices == char slices); non-ASCII doc_id ' || doc_id) END AS text,
         |        strlen(text) AS L FROM documents),
         |f AS (SELECT doc_id, text, L,
         |        unnest(range(0, least($maxFrames, 1 + (L-1)//$frameLen))) AS fi
         |      FROM d)
         |SELECT doc_id, CAST(fi AS INTEGER) AS frame_idx,
         |  CAST(least($frameLen, L - fi*$frameLen) AS INTEGER) AS frame_bytes,
         |  md5(substr(text, CAST(fi*$frameLen + 1 AS INTEGER), $frameLen)) AS frame_sig
         |FROM f""".stripMargin)
}
