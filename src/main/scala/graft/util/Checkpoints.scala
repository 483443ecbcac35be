package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle helper for `localCheckpoint`ed DataFrames. Spark never
  * frees the RDD blocks behind a local checkpoint on its own — a
  * fixpoint loop that replaces its accumulator each round without
  * freeing the superseded checkpoint accumulates dead blocks for the
  * life of the session (fine for one query, a leak for a long-running
  * driver issuing many closures).
  */
object Checkpoints {

  /** Unpersist the blocks behind a DataFrame returned by
    * `localCheckpoint`. Intentionally a no-op for anything that is not
    * a bare checkpoint root (a derived plan may share `LogicalRDD`
    * leaves — e.g. a still-live upstream checkpoint — that must not be
    * freed from under other consumers). */
  def free(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
    case _              => ()
  }

  /** Unpersist EVERY checkpoint block a frame's plan reads — for
    * freeing a consumed result whose plan the caller wholly owns
    * (e.g. `closure(...)` returns a projection over its final
    * checkpoint). Unsafe if the plan shares a checkpoint with another
    * still-live frame — use [[free]] for those. */
  def freeAll(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _              => ()
    }
}
