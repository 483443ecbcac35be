package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Scale

/** Sample code through the Scale surface: bucketed co-located join
  * (prints whether the plan is exchange-free) and salted-join result
  * equivalence. Usage: sbt 'runMain graft.tools.ScaleDemo'
  */
object ScaleDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(master = "local[8]", shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"

    Scale.writeBucketed(Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
      "demo_orders", "o_orderkey", 8)
    Scale.writeBucketed(Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "demo_lineitem", "o_orderkey", 8)
    val j = Scale.colocatedJoin(spark, "demo_orders", "demo_lineitem", "o_orderkey")
    val plan = j.queryExecution.executedPlan.toString
    println(s"bucketed join rows=${j.count()} smj=${plan.contains("SortMergeJoin")} exchanges=${plan.linesIterator.count(_.contains("Exchange"))}")

    val l = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf).select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plainN = l.join(o, "l_orderkey").count()
    val saltedN = Scale.saltedJoin(l, o, "l_orderkey", 8).count()
    println(s"salted join rows=$saltedN plain=$plainN equal=${saltedN == plainN}")

    // probe: nSalts = 1 degenerates to the plain join
    println(s"salt1 rows=${Scale.saltedJoin(l, o, "l_orderkey", 1).count()}")
    spark.stop()
  }
}
