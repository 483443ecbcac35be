package graft.er

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Entity resolution & linking (SURVEY §2.B) — the reference's
  * `apps/entity-resolver/index.Rmd` + `data-gathering/misc/
  * export-duplicates.R` (normalize → candidate pairs → fuzzy match →
  * confirmed merge groups) and `data-linking` (label search against an
  * external authority, keep top match), re-expressed as Spark plans.
  *
  * Scale notes (100 TB):
  *   - Candidate generation is ALWAYS blocked (first-token block key):
  *     pair count is sum of per-block n², never global n². At
  *     production, add a block-size cap + salting for hot blocks (the
  *     classic "Smith" problem) — noted inline.
  *   - Fuzzy scoring uses the codegen'd `levenshtein` expression, no
  *     UDF boxing.
  *   - Connected components run edge-centric in GraphX (Pregel-style
  *     small-label propagation, the scalable choice for huge sparse
  *     match graphs); the DuckDB oracle replays it as recursive
  *     reachability.
  *   - Linking broadcasts the authority dictionary (dims are small
  *     even at 100 TB fact scale) and resolves top-1 with one window.
  */
object ER {

  /** Shared name normalization: lower, strip punctuation, collapse
    * whitespace — identical semantics to the SQL in [[normSql]]. */
  def norm(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(trim(c)), "[^a-z0-9 ]", ""), " +", " "))

  def normSql(c: String): String =
    s"trim(regexp_replace(regexp_replace(lower(trim($c)), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"

  /** Mention pool: entity labels from three sources. */
  private def mentions(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(lit("customer").as("src"), col("c_custkey").as("id"), col("c_name").as("label"))
    val s = Tables.supplier(spark, dir)
      .select(lit("supplier").as("src"), col("s_suppkey").as("id"), col("s_name").as("label"))
    val p = Tables.part(spark, dir)
      .select(lit("part").as("src"), col("p_partkey").as("id"), col("p_name").as("label"))
    c.unionAll(s).unionAll(p)
  }

  private val mentionsSql =
    """(SELECT 'customer' AS src, c_custkey AS id, c_name AS label FROM customer
      | UNION ALL SELECT 'supplier', s_suppkey, s_name FROM supplier
      | UNION ALL SELECT 'part', p_partkey, p_name FROM part)""".stripMargin

  /** er_normalize — normalized mention table (narrow map, no shuffle). */
  def erNormalize(spark: SparkSession, dir: String): DataFrame =
    mentions(spark, dir).select(col("src"), col("id"), col("label"), norm(col("label")).as("norm"))

  /** er_exact_dups — exact-duplicate groups on the normalized key:
    * one groupBy (map-side partial), canonical id = min id. */
  def erExactDups(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey").as("id"), norm(col("p_name")).as("norm"))
      .groupBy(col("norm"))
      .agg(count(lit(1)).as("n_dups"), min(col("id")).as("canonical_id"))
      .filter(col("n_dups") >= 2)

  /** Normalized parts with their block key (first token). */
  private def blockedParts(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey").as("id"), norm(col("p_name")).as("norm"))
      .withColumn("blk", split(col("norm"), " ").getItem(0))

  /** Candidate pairs within a block. The block key has LOW cardinality
    * (~20 first tokens), so a shuffle join would put each block on one
    * task — guaranteed skew. Instead: round-robin repartition the probe
    * side and broadcast the build side → every core generates pairs for
    * a slice of every block. (At 100 TB the build side is the blocked
    * *dictionary*, still broadcast-sized; a giant build side would call
    * for salted keys instead — noted here as the fallback.) */
  private def candidatePairs(spark: SparkSession, dir: String): DataFrame = {
    val p = blockedParts(spark, dir).withColumn("len", length(col("norm")))
    val a = p.repartition(spark.sessionState.conf.numShufflePartitions)
      .select(col("blk"), col("id").as("id_a"), col("norm").as("norm_a"), col("len").as("len_a"))
    val b = p.select(col("blk"), col("id").as("id_b"), col("norm").as("norm_b"), col("len").as("len_b"))
    a.join(broadcast(b), Seq("blk")).filter(col("id_a") < col("id_b"))
  }

  /** er_blocking — candidate pairs within a block (per-block n², never
    * global n²). At production scale add: block-size cap + salting. */
  def erBlocking(spark: SparkSession, dir: String): DataFrame =
    candidatePairs(spark, dir).select(col("blk"), col("id_a"), col("id_b"))

  /** er_fuzzy_match — Levenshtein ≤ 2 on blocked candidate pairs.
    * Result-preserving optimizations (the oracle is unchanged):
    * length-difference ≤ 2 is NECESSARY for lev ≤ 2, and it's a cheap
    * codegen'd predicate evaluated before the expensive one; the
    * thresholded `levenshtein(a, b, 2)` runs a banded DP that exits
    * early (returns -1 above the threshold). */
  def erFuzzyMatch(spark: SparkSession, dir: String): DataFrame = {
    candidatePairs(spark, dir)
      .filter(abs(col("len_a") - col("len_b")) <= 2)
      .withColumn("dist", levenshtein(col("norm_a"), col("norm_b"), 2))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("norm_a"), col("norm_b"), col("dist"))
  }

  /** er_connected_components — cluster ids over the fuzzy-match edge
    * set via GraphX (edge-centric label propagation; comp = min vertex
    * id, singletons included). */
  def erConnectedComponents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.graphx.{Edge, Graph}
    val sess = spark
    import sess.implicits._
    // materialize the match edges ONCE — GraphX's iterations must not
    // re-run the blocked levenshtein join every superstep
    // coalesce: the match graph is tiny relative to the pair-generation
    // stage; GraphX superstep overhead scales with partition count, so
    // don't carry 32 near-empty partitions through Pregel
    val edges = erFuzzyMatch(spark, dir)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint(eager = true)
      .coalesce(4)
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
    val vertices = Tables.part(spark, dir)
      .select(col("p_partkey")).rdd.map(r => (r.getLong(0), ()))
    val graph = Graph(vertices, edges)
    val cc = graph.connectedComponents().vertices
    cc.toDF("id", "comp")
  }

  /** er_linking — link each part mention to the authority concept
    * dictionary (distinct second tokens, id = min member part id):
    * broadcast the dictionary, score all (mention, concept) pairs with
    * Levenshtein, keep top-1 per mention via one window. */
  def erLinking(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .select(col("p_partkey").as("id"), norm(col("p_name")).as("norm"))
    val concepts = p
      .withColumn("concept", split(col("norm"), " ").getItem(1))
      .filter(col("concept").isNotNull)
      .groupBy(col("concept")).agg(min(col("id")).as("concept_id"))
    val scored = p.crossJoin(broadcast(concepts))
      .withColumn("score", levenshtein(col("norm"), col("concept")))
    val w = Window.partitionBy(col("id")).orderBy(col("score"), col("concept"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("id"), col("norm"), col("concept"), col("concept_id"), col("score"))
  }

  /** er_canonicalize — apply confirmed merges to the graph: rewrite
    * has_part edge targets to each duplicate cluster's canonical
    * (min-id) part, dropping edges that collapse into one. The
    * reference's "human-confirmed merge → canonical entity id" step
    * closed end-to-end: ER output flows back into the triple store.
    * The component map is dictionary-sized → broadcast. */
  def erCanonicalize(spark: SparkSession, dir: String): DataFrame = {
    import graft.kg.Triples
    val comp = erConnectedComponents(spark, dir)
      .select((col("id") + lit(Triples.PART * Triples.NS)).as("o_id"),
        (col("comp") + lit(Triples.PART * Triples.NS)).as("canonical"))
    graft.kg.Triples.statements(spark, dir)
      .filter(col("p") === "has_part")
      .join(broadcast(comp), Seq("o_id"))
      .select(col("s"), col("p"), col("canonical").as("o_id"))
      .distinct()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "er_canonicalize"         -> (erCanonicalize _),
    "er_normalize"            -> (erNormalize _),
    "er_exact_dups"           -> (erExactDups _),
    "er_blocking"             -> (erBlocking _),
    "er_fuzzy_match"          -> (erFuzzyMatch _),
    "er_connected_components" -> (erConnectedComponents _),
    "er_linking"              -> (erLinking _))

  private val N = normSql("p_name")

  val oracles: Map[String, String] = Map(
    "er_canonicalize" -> {
      val NS = graft.kg.Triples.NS
      val P0 = graft.kg.Triples.PART * NS
      s"""${graft.kg.Triples.sqlCte},
         |p AS (SELECT p_partkey AS id, $N AS norm FROM part),
         |b AS (SELECT id, norm, string_split(norm, ' ')[1] AS blk FROM p),
         |m AS (SELECT a.id AS id_a, x.id AS id_b
         |      FROM b a JOIN b x ON a.blk = x.blk AND a.id < x.id
         |      WHERE levenshtein(a.norm, x.norm) <= 2),
         |e AS (SELECT id_a AS a, id_b AS b FROM m UNION ALL SELECT id_b, id_a FROM m),
         |reach AS (
         |  WITH RECURSIVE r(src, node) AS (
         |    SELECT id, id FROM p
         |    UNION
         |    SELECT r.src, e.b FROM r JOIN e ON e.a = r.node)
         |  SELECT src, node FROM r),
         |comp AS (SELECT src AS id, min(node) AS comp FROM reach GROUP BY src)
         |SELECT DISTINCT t.s, t.p, $P0 + c.comp AS o_id
         |FROM triples t JOIN comp c ON t.o_id = $P0 + c.id
         |WHERE t.p = 'has_part'""".stripMargin
    },
    "er_normalize" ->
      s"""SELECT src, id, label, ${normSql("label")} AS norm FROM $mentionsSql m""",
    "er_exact_dups" ->
      s"""SELECT $N AS norm, count(*) AS n_dups, min(p_partkey) AS canonical_id
         |FROM part GROUP BY 1 HAVING count(*) >= 2""".stripMargin,
    "er_blocking" ->
      s"""WITH p AS (SELECT p_partkey AS id, $N AS norm FROM part),
         |b AS (SELECT id, norm, string_split(norm, ' ')[1] AS blk FROM p)
         |SELECT a.blk, a.id AS id_a, x.id AS id_b
         |FROM b a JOIN b x ON a.blk = x.blk AND a.id < x.id""".stripMargin,
    "er_fuzzy_match" ->
      s"""WITH p AS (SELECT p_partkey AS id, $N AS norm FROM part),
         |b AS (SELECT id, norm, string_split(norm, ' ')[1] AS blk FROM p)
         |SELECT a.id AS id_a, x.id AS id_b, a.norm AS norm_a, x.norm AS norm_b,
         |  CAST(levenshtein(a.norm, x.norm) AS INTEGER) AS dist
         |FROM b a JOIN b x ON a.blk = x.blk AND a.id < x.id
         |WHERE levenshtein(a.norm, x.norm) <= 2""".stripMargin,
    "er_connected_components" ->
      s"""WITH p AS (SELECT p_partkey AS id, $N AS norm FROM part),
         |b AS (SELECT id, norm, string_split(norm, ' ')[1] AS blk FROM p),
         |m AS (SELECT a.id AS id_a, x.id AS id_b
         |      FROM b a JOIN b x ON a.blk = x.blk AND a.id < x.id
         |      WHERE levenshtein(a.norm, x.norm) <= 2),
         |e AS (SELECT id_a AS a, id_b AS b FROM m UNION ALL SELECT id_b, id_a FROM m),
         |reach AS (
         |  WITH RECURSIVE r(src, node) AS (
         |    SELECT id, id FROM p
         |    UNION
         |    SELECT r.src, e.b FROM r JOIN e ON e.a = r.node)
         |  SELECT src, node FROM r)
         |SELECT src AS id, min(node) AS comp FROM reach GROUP BY src""".stripMargin,
    "er_linking" ->
      s"""WITH p AS (SELECT p_partkey AS id, $N AS norm FROM part),
         |c AS (SELECT string_split(norm, ' ')[2] AS concept, min(id) AS concept_id
         |      FROM p WHERE string_split(norm, ' ')[2] IS NOT NULL GROUP BY 1)
         |SELECT id, norm, concept, concept_id, CAST(levenshtein(norm, concept) AS INTEGER) AS score
         |FROM p CROSS JOIN c
         |QUALIFY row_number() OVER (PARTITION BY id ORDER BY levenshtein(norm, concept), concept) = 1""".stripMargin)
}
