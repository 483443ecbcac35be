package graft.kg

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** User-facing query DSL over a statements table — the programmatic
  * face of the SPARQL-class capability (what a reference user writes
  * instead of a .rq file). All methods return lazy DataFrames, so
  * composition stays one Catalyst plan: filters/pruning reach the
  * statement scan and the optimizer sees the whole pipeline.
  *
  * {{{
  * val store = TripleStore(spark, dir)
  * store.pattern("in_nation")                          // one triple pattern
  *   .join(store.labeled("o_id"), "o_id")              // label service
  * store.khop(store.byLabel("ASIA"), k = 2)            // neighborhood
  * store.closure(Seq("in_nation", "in_region"))        // property path +
  * }}}
  */
final class TripleStore(val spark: SparkSession, val statements: DataFrame) {

  /** One triple pattern: all statements with predicate `p`. */
  def pattern(p: String): DataFrame = statements.filter(col("p") === p)

  /** Entities of a namespace (id-range pruned, no join). */
  def inNamespace(c: Column, ns: Int): Column =
    c >= lit(ns.toLong * Triples.NS) && c < lit((ns + 1).toLong * Triples.NS)

  /** The id→label dimension (broadcastable). */
  def labels: DataFrame =
    pattern("label").select(col("s").as("id"), col("o_val").as("label"))

  /** Label-service join: resolve `idCol` of `df` to labels. */
  def labeled(df: DataFrame, idCol: String): DataFrame =
    df.join(broadcast(labels), df(idCol) === col("id")).drop("id")

  /** Seed set: entity ids carrying an exact label. */
  def byLabel(label: String): DataFrame =
    pattern("label").filter(col("o_val") === label).select(col("s").as("node"))

  /** Undirected entity edges from all o_id statements. */
  def edges: DataFrame = {
    val fwd = statements.filter(col("o_id").isNotNull)
      .select(col("s").as("a"), col("o_id").as("b"))
    fwd.unionAll(fwd.select(col("b").as("a"), col("a").as("b")))
  }

  /** k-hop neighborhood with min hop distance (frontier BFS; the
    * frontier is anti-joined against visited so each hop only expands
    * new nodes — sparse at every step). */
  def khop(seeds: DataFrame, k: Int): DataFrame = {
    val e = edges.localCheckpoint(eager = true)
    var visited = seeds.select(col("node")).distinct().withColumn("dist", lit(0))
    var frontier = visited.select("node")
    for (hop <- 1 to k) {
      val next = frontier.join(e, col("node") === col("a"))
        .select(col("b").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .localCheckpoint(eager = true)
      visited = visited.unionAll(next.withColumn("dist", lit(hop)))
      frontier = next
    }
    visited
  }

  /** Transitive closure over a predicate alternation — SPARQL
    * `(p1|p2)+`. Iterative fixpoint; localCheckpoint bounds lineage. */
  def closure(preds: Seq[String]): DataFrame = {
    val e = statements.filter(col("p").isin(preds: _*))
      .select(col("s").as("a"), col("o_id").as("b"))
      .localCheckpoint(eager = true)
    var acc = e
    var frontier = e
    var continue = true
    while (continue) {
      val next = frontier
        .join(e.withColumnRenamed("a", "b_").withColumnRenamed("b", "c"), col("b") === col("b_"))
        .select(col("a"), col("c").as("b"))
        .exceptAll(acc).distinct()
        .localCheckpoint(eager = true)
      if (next.isEmpty) continue = false
      else { acc = acc.unionAll(next).distinct().localCheckpoint(eager = true); frontier = next }
    }
    acc.select(col("a").as("s"), col("b").as("reach"))
  }

  /** Statement diff against another store's statements for one
    * predicate: match / conflict / missing classification. */
  def diff(other: DataFrame, p: String): DataFrame = {
    val a = pattern(p).select(col("s"), col("o_val").as("a_val"))
    val b = other.select(col("s"), col("o_val").as("b_val"))
    a.join(b, Seq("s"), "full_outer")
      .select(col("s"), col("a_val"), col("b_val"),
        when(col("b_val").isNull, "missing_in_b")
          .when(col("a_val").isNull, "missing_in_a")
          .when(col("a_val") === col("b_val"), "match")
          .otherwise("conflict").as("status"))
  }

  /** GraphX view of this store. */
  def graph = Graphs.fromStatements(statements)
}

object TripleStore {
  /** Store over the test star schema's RML-lite mapping. */
  def apply(spark: SparkSession, dir: String): TripleStore =
    new TripleStore(spark, Triples.statements(spark, dir))

  /** Store over an arbitrary statements table `(s, p, o_id, o_val)`. */
  def apply(spark: SparkSession, statements: DataFrame): TripleStore =
    new TripleStore(spark, statements)
}
