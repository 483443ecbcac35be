package graft.kg

import org.apache.spark.graphx.{Edge, Graph, VertexRDD}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GraphX bridge (SURVEY §2.F) — the reference's `analysis/network`
  * capability (statements → network, neighbor expansion, degree /
  * component structure) as library API over the triple store.
  *
  * Namespaced long entity ids ARE GraphX `VertexId`s — no re-keying
  * pass. Edge-centric Pregel algorithms (CC, PageRank) are the right
  * shape for huge sparse graphs: state is per-vertex, messages flow
  * along co-partitioned edges.
  */
object Graphs {

  /** Entity graph from the o_id statements (edge attr = predicate).
    * `numPartitions` sizes the Pregel shuffles: per-superstep overhead
    * scales with partition count, so size it to edge volume (locally a
    * handful; on a cluster ∝ edge bytes / 128 MB). */
  def fromStatements(st: DataFrame, numPartitions: Int = 8): Graph[Unit, String] = {
    val edges = st.filter(col("o_id").isNotNull)
      .select(col("s"), col("o_id"), col("p"))
      .coalesce(numPartitions)
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), r.getString(2)))
    Graph.fromEdges(edges, ())
  }

  def connectedComponents(st: DataFrame): VertexRDD[Long] =
    fromStatements(st).connectedComponents().vertices

  def degrees(spark: SparkSession, st: DataFrame): DataFrame = {
    val sess = spark; import sess.implicits._
    fromStatements(st).degrees.toDF("id", "degree")
  }

  def pageRank(spark: SparkSession, st: DataFrame, tol: Double = 0.001): DataFrame = {
    val sess = spark; import sess.implicits._
    fromStatements(st).pageRank(tol).vertices.toDF("id", "rank")
  }

  /** Fixed-iteration PageRank: deterministic step count (no
    * convergence probe), the variant to prefer for reproducible
    * pipeline output and bounded cost at scale. */
  def staticPageRank(spark: SparkSession, st: DataFrame, numIter: Int = 10): DataFrame = {
    val sess = spark; import sess.implicits._
    fromStatements(st).staticPageRank(numIter).vertices.toDF("id", "rank")
  }
}
