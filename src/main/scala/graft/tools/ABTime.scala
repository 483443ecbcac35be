package graft.tools

import graft.SparkEntry

/** Dev tool: same-JVM A/B timing for named queries — the only timing
  * comparison this box supports (wall-clock varies ±4× across
  * processes; see SURVEY §5). Runs each named query `reps` times
  * back-to-back in ONE session and prints every rep's seconds, so a
  * cross-round delta can be attributed to code vs box noise.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.ABTime [reps] q1 q2… */
object ABTime {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val (reps, names) = args.headOption.flatMap(_.toIntOption) match {
      case Some(r) => (r, args.tail.toSeq)
      case None    => (3, args.toSeq)
    }
    require(names.nonEmpty && names.forall(SparkEntry.queries.contains),
      s"usage: ABTime [reps] <query>… ; unknown: ${names.filterNot(SparkEntry.queries.contains).mkString(",")}")
    names.foreach { n =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"ABTIME $n reps=$reps ${times.map(t => f"$t%.2f").mkString(" ")}s")
    }
    spark.stop()
  }
}
