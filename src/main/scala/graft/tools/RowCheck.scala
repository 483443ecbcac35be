package graft.tools

import graft.SparkEntry

/** Dev tool: print row counts for the given queries (default: the
  * rows-only [R] set) at SPARK_GRAFT_SF_DIR — guards the driver's
  * rows>0 check at every scale factor. */
object RowCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val names = if (args.nonEmpty) args.toSeq else rowsOnly.toSeq.sorted
    names.foreach { n =>
      val c = SparkEntry.queries(n)(spark, dir).count()
      println(s"ROWS $n $c")
    }
    spark.stop()
  }
}
