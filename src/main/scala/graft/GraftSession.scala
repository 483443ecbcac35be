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
      // AQE coalescing is byte-based and blind to CPU density: with the
      // default minPartitionSize (1 MB) a compute-dense stage over a
      // small-byte shuffle (levenshtein over salted pairs, explode fans,
      // render batteries) coalesces to ONE task while the other cores
      // idle — measured 1.7–1.8 s single-task stages in er_fuzzy_match
      // at sf0.1 local[32]. 64k keeps such stages parallel (partition
      // count stays capped by spark.sql.shuffle.partitions, so trivial
      // stages don't explode into micro-tasks). Parameterized: at
      // cluster scale, where shuffle bytes per stage are orders larger,
      // the default 1m is fine and this knob is a no-op in practice.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k"))
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
