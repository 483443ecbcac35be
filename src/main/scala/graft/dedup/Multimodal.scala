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
    * call; signature (bytes in, fixed-shape features out) is what a
    * real decoder satisfies. */
  private def fakeDecode(payload: Array[Byte]): (Int, Int, Long) = {
    var cs = 1125899906842597L
    var i = 0
    while (i < payload.length) { cs = cs * 31 + (payload(i) & 0xff); i += 1 }
    val width = 320 + (math.abs(cs) % 1601).toInt
    val height = 240 + (math.abs(cs / 7) % 841).toInt
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
      // real decoder init goes here (once per partition, not per row)
      it.map { r =>
        val (w, h, cs) = fakeDecode(r.payload)
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta"        -> (mmMeta _),
    "mm_framesample" -> (mmFrameSample _))

  /** mm_meta is [R] rows-only (the decode stub isn't SQL-expressible);
    * mm_framesample's md5 frame signatures replay exactly. The oracle
    * slices text by CHARACTERS while the Spark side slices the UTF-8
    * BYTE payload — equal only for ASCII, so the oracle ENFORCES that
    * assumption: a non-ASCII document raises a loud error() instead of
    * silently hash-mismatching the gate. */
  val oracles: Map[String, String] = Map(
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
