package graft.tools

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.SparkEntry

/** Dev tool: per-stage time/shuffle profile for named queries (guide §1
  * empirical loop without the UI — spark.ui is disabled in the graft
  * session). Runs each query once warm-ish (after one untimed JVM
  * warm-up), captures every completed stage's wall time, task count,
  * shuffle read/write and spill via a listener, and prints the stages
  * sorted by cost. The timed action is the noop sink (guide §1.4).
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.Profile q1 q2… */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    require(args.nonEmpty && args.forall(SparkEntry.queries.contains),
      s"usage: Profile <query>… ; unknown: ${args.filterNot(SparkEntry.queries.contains).mkString(",")}")

    final case class St(name: String, ms: Long, tasks: Int,
        shufReadMB: Double, shufWriteMB: Double, inputMB: Double, spillMB: Double)
    val stages = mutable.ArrayBuffer.empty[St]
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val ms = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(0L)
        stages.synchronized {
          stages += St(s"stage${si.stageId} ${si.name.takeWhile(_ != '(').trim}",
            ms, si.numTasks,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            m.inputMetrics.bytesRead / 1e6,
            m.diskBytesSpilled / 1e6)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // JVM warm-up so the first query's profile is not classloading
    import org.apache.spark.sql.functions.{col, count}
    spark.read.parquet(s"$dir/region.parquet")
      .groupBy(col("r_name")).agg(count(col("r_regionkey"))).count()

    args.foreach { n =>
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // let straggling listener events drain: poll until the captured
      // stage count is stable across a 100 ms window (bounded at 3 s) —
      // a fixed sleep raced late onStageCompleted events and silently
      // under-reported stage-sum, the very metric the wall-vs-stage-sum
      // gap analysis rests on (the listener bus has no public flush API)
      locally {
        var prev = -1
        var cur = stages.synchronized(stages.size)
        var waited = 0
        while (cur != prev && waited < 3000) {
          Thread.sleep(100); waited += 100
          prev = cur; cur = stages.synchronized(stages.size)
        }
      }
      val snap = stages.synchronized(stages.toVector)
      val sum = snap.map(_.ms).sum / 1e3
      println(f"%nPROFILE $n wall=$wall%.2fs stage-sum=$sum%.2fs stages=${snap.size} tasks=${snap.map(_.tasks).sum}")
      snap.sortBy(-_.ms).take(18).foreach { s =>
        println(f"  ${s.ms}%6d ms ${s.tasks}%4d tasks  in=${s.inputMB}%8.1fMB  sr=${s.shufReadMB}%8.2fMB sw=${s.shufWriteMB}%8.2fMB spill=${s.spillMB}%6.1fMB  ${s.name}")
      }
      spark.sparkContext.getRDDStorageInfo.filter(_.memSize > 10L * 1024 * 1024)
        .sortBy(-_.memSize).take(8).foreach { i =>
        println(f"  RDD ${i.id}%4d mem=${i.memSize / 1e6}%8.1fMB disk=${i.diskSize / 1e6}%8.1fMB parts=${i.numCachedPartitions} ${i.name}")
        spark.sparkContext.getPersistentRDDs.get(i.id).foreach { r =>
          println("    " + r.toDebugString.linesIterator.take(3).mkString(" | "))
        }
      }
    }
    spark.stop()
  }
}
