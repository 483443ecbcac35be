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

  /** mm_meta — binary payload + metadata → per-partition batched
    * "decode" → typed feature rows. */
  def mmMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val records = Tables.documents(spark, dir)
      .select(col("doc_id"),
        concat(lit("img/"), col("source")).as("fmt"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MmRecord]
    records.mapPartitions { it =>
      // real decoder init goes here (once per partition, not per row)
      it.map { r =>
        val (w, h, cs) = fakeDecode(r.payload)
        MmFeature(r.doc_id, r.fmt, r.payload.length, w, h, cs)
      }
    }.toDF()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta" -> (mmMeta _))

  /** [R] rows-only: the decode stub isn't SQL-expressible. */
  val oracles: Map[String, String] = Map.empty
}
