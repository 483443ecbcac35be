package graft.tools

import graft.SparkEntry

/** Dev tool: dump `explain("formatted")` for the given queries (or all)
  * so scan pruning (ReadSchema), pushed filters, and join strategies
  * can be audited. Usage:
  *   sbt 'runMain graft.tools.Explain q1_agg q5_multi_join'
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
