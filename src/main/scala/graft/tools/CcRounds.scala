package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.er.ER
import graft.sources.Tables

/** Dev probe: rounds until MIN-LABEL PROPAGATION converges on the ER
  * match graph — the constant that justifies the unrolled-rounds
  * DuckDB oracle for er_connected_components / er_canonicalize (the
  * kg_shortest_path capped-recursion precedent: the cap is a measured
  * graph property, pinned with slack, and the propagation converges
  * in exactly max-dist-to-component-min rounds).
  *
  * Usage: runMain graft.tools.CcRounds <sfDir> [<sfDir>…] */
object CcRounds {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    dirs.foreach { dir =>
      val pairs = ER.erFuzzyMatch(spark, dir)
        .select(col("id_a").as("a"), col("id_b").as("b"))
      val e = pairs.unionAll(pairs.select(col("b").as("a"), col("a").as("b")))
        .localCheckpoint()
      var comp = Tables.part(spark, dir)
        .select(col("p_partkey").cast("long").as("id"), col("p_partkey").cast("long").as("comp"))
        .localCheckpoint()
      var rounds = 0
      var changed = 1L
      while (changed > 0) {
        val next = comp.unionAll(
            comp.join(e, col("id") === col("a")).select(col("b").as("id"), col("comp")))
          .groupBy("id").agg(min("comp").as("comp"))
          .localCheckpoint()
        changed = next.join(comp.withColumnRenamed("comp", "old"), "id")
          .filter(col("comp") =!= col("old")).count()
        comp = next
        rounds += 1
      }
      // rounds counts the final no-change confirmation round too
      println(s"CCROUNDS $dir converged_after=${rounds - 1} rounds (+1 confirm)")
    }
    spark.stop()
  }
}
