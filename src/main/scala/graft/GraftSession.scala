package graft

import org.apache.spark.sql.SparkSession

/** Tuned session factory for the graft engine.
  *
  * Local testing runs `local[32]`; the same settings translate to a real
  * cluster (AQE re-plans shuffles at runtime, skew-join handles hot keys,
  * broadcast threshold keeps dimension joins shuffle-free). Only the
  * shuffle-partition count is environment-specific: 32 locally, and on a
  * 1000-executor cluster it should be sized ~ input bytes / 128 MB.
  */
object GraftSession {
  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .withExtensions(new graft.functions.GraftExtensions()(_))
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // AQE coalescing is byte-based and blind to CPU density: a
      // compute-dense stage over a small-byte shuffle can coalesce to
      // one task. A 64k floor was MEASURED both ways at sf0.1
      // local[32]: it parallelized the salted-levenshtein stages in
      // profiles, but the bench's count() plans got slower overall
      // (kg_communities 4.1 → 6.0 s warm, er_fuzzy_match 0.75 → 1.2 s
      // — the extra micro-tasks cost more in scheduling than the
      // parallelism returned at this data size), so the DEFAULT stays
      // Spark's 1m and the knob is left for workloads whose
      // small-shuffle stages are genuinely CPU-bound.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "1m"))
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BROADCAST_BYTES", (64L * 1024 * 1024).toString))
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS) — read as long, normalized
      // in Tables.events (Spark has no ns TimestampType).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // per-process warehouse: managed-table locations must not collide
      // with a previous JVM's leftovers (LOCATION_ALREADY_EXISTS)
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft_warehouse_${ProcessHandle.current().pid()}")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
