package graft.kg

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import Triples.{sqlCte => T}

/** The Wikibase STATEMENT layer (SURVEY §2.A extension): statements as
  * first-class entities with ranks and qualifiers — the reference's
  * actual data model. Its queries don't just read `(s, p, o)` edges:
  * they select the best-ranked statement per property
  * (`a wikibase:BestRank`, time-items.rq:63), read qualifier values
  * hanging off a statement node (`?stmt fgpsv:P38 [ wikibase:timePrecision
  * ?prec ]`, time-items.rq:64–66), compare typed temporal literals at a
  * stated precision (time-items.rq:66 `CONCAT(STR(?v), "/", STR(?prec))`),
  * and introspect property metadata (`wikibase:propertyType`, the
  * corresponding-Wikidata-property P343 —
  * get_all_properties_with_corresponding_prop.rq:12–14).
  *
  * Relational shape: statements get a synthesized long `sid`
  * (statement id = `s*10 + variant`, still a fixed-width integer key),
  * ranks live as a column on the statement, and qualifiers are a
  * separate `(sid, qp, q_oid, q_oval)` relation keyed by `sid` —
  * exactly how Wikibase's RDF dump reifies statements, minus the IRIs.
  *
  * Scale notes (100 TB): the qualifier relation joins its statement on
  * a long key and GROWS with the graph — no broadcast hint anywhere
  * here (AQE handles test SF; the production layout co-buckets
  * statements and qualifiers on sid, the same serving answer as the
  * label store). BestRank is one window over (s, p) — partition count
  * follows the statement shuffle, per-group state is one property's
  * statements. The property dimension IS bounded (a dictionary), so
  * the census join broadcasts it.
  *
  * Test-data synthesis (deterministic, key-derived — no RNG): customer
  * market segments play the multi-valued ranked property. Every
  * customer carries its current segment at `normal` rank; every 4th a
  * `deprecated` LEGACY value (superseded history); every 6th a
  * `preferred` UPGRADED value (the curated override). Qualifiers
  * attach a `since` date (key-derived `make_date`), a `stated_in`
  * entity ref (the customer's nation), and an `until` date on the
  * deprecated rows. Order dates play the typed temporal literals, with
  * a Wikibase-style precision code (9=year, 10=month, 11=day).
  */
object Wikibase {

  private val rankOrd: Column =
    when(col("stmt_rank") === "preferred", 2)
      .when(col("stmt_rank") === "normal", 1)
      .otherwise(0)
  private val rankOrdSql =
    "CASE stmt_rank WHEN 'preferred' THEN 2 WHEN 'normal' THEN 1 ELSE 0 END"

  private def cid = Triples.id(Triples.CUSTOMER, col("c_custkey"))
  private val cidSql = Triples.idSql(Triples.CUSTOMER, "c_custkey")

  /** Ranked statement layer `(sid, s, p, o_val, stmt_rank)`. */
  def qualifiedStatements(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val v0 = c.select((cid * 10).as("sid"), cid.as("s"), lit("mktsegment").as("p"),
      col("c_mktsegment").as("o_val"), lit("normal").as("stmt_rank"))
    val v1 = c.filter(col("c_custkey") % 4 === 0)
      .select((cid * 10 + 1).as("sid"), cid.as("s"), lit("mktsegment").as("p"),
        lit("LEGACY").as("o_val"), lit("deprecated").as("stmt_rank"))
    val v2 = c.filter(col("c_custkey") % 6 === 0)
      .select((cid * 10 + 2).as("sid"), cid.as("s"), lit("mktsegment").as("p"),
        lit("UPGRADED").as("o_val"), lit("preferred").as("stmt_rank"))
    v0.unionAll(v1).unionAll(v2)
  }

  private val qstmtSql =
    s"""qstmt AS (
       |  SELECT $cidSql*10 AS sid, $cidSql AS s, 'mktsegment' AS p,
       |    c_mktsegment AS o_val, 'normal' AS stmt_rank FROM customer
       |  UNION ALL
       |  SELECT $cidSql*10 + 1, $cidSql, 'mktsegment', 'LEGACY', 'deprecated'
       |  FROM customer WHERE c_custkey % 4 = 0
       |  UNION ALL
       |  SELECT $cidSql*10 + 2, $cidSql, 'mktsegment', 'UPGRADED', 'preferred'
       |  FROM customer WHERE c_custkey % 6 = 0)""".stripMargin

  /** Qualifier relation `(sid, qp, q_oid, q_oval)`: `since` +
    * `stated_in` (entity-valued) on the current statement, `until` on
    * the deprecated one. Dates are key-derived `make_date` — exact
    * integer arithmetic, identical in DuckDB. */
  def qualifiers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val since = c.select((cid * 10).as("sid"), lit("since").as("qp"),
      lit(null).cast("long").as("q_oid"),
      make_date(lit(1992) + col("c_custkey") % 7, lit(1) + col("c_custkey") % 12,
        lit(1) + col("c_custkey") % 28).cast("string").as("q_oval"))
    val statedIn = c.select((cid * 10).as("sid"), lit("stated_in").as("qp"),
      Triples.id(Triples.NATION, col("c_nationkey")).as("q_oid"),
      lit(null).cast("string").as("q_oval"))
    val until = c.filter(col("c_custkey") % 4 === 0)
      .select((cid * 10 + 1).as("sid"), lit("until").as("qp"),
        lit(null).cast("long").as("q_oid"),
        make_date(lit(1990) + col("c_custkey") % 5, lit(1) + col("c_custkey") % 6,
          lit(15)).cast("string").as("q_oval"))
    since.unionAll(statedIn).unionAll(until)
  }

  private val qualsSql =
    s"""quals AS (
       |  SELECT $cidSql*10 AS sid, 'since' AS qp, CAST(NULL AS BIGINT) AS q_oid,
       |    CAST(make_date(CAST(1992 + c_custkey % 7 AS INTEGER),
       |      CAST(1 + c_custkey % 12 AS INTEGER), CAST(1 + c_custkey % 28 AS INTEGER)) AS VARCHAR) AS q_oval
       |  FROM customer
       |  UNION ALL
       |  SELECT $cidSql*10, 'stated_in', ${Triples.idSql(Triples.NATION, "c_nationkey")},
       |    CAST(NULL AS VARCHAR)
       |  FROM customer
       |  UNION ALL
       |  SELECT $cidSql*10 + 1, 'until', CAST(NULL AS BIGINT),
       |    CAST(make_date(CAST(1990 + c_custkey % 5 AS INTEGER),
       |      CAST(1 + c_custkey % 6 AS INTEGER), 15) AS VARCHAR)
       |  FROM customer WHERE c_custkey % 4 = 0)""".stripMargin

  /** kg_best_rank — `a wikibase:BestRank` (time-items.rq:63): per
    * (s, p), the preferred statements if any exist, else the normal
    * ones; deprecated statements are NEVER best, even when nothing
    * else remains. One window max over (s, p) — the standard argmax. */
  def kgBestRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("s"), col("p"))
    qualifiedStatements(spark, dir)
      .withColumn("best_ord", max(rankOrd).over(w))
      .filter(rankOrd === col("best_ord") && col("stmt_rank") =!= "deprecated")
      .select(col("sid"), col("s"), col("p"), col("o_val"), col("stmt_rank"))
  }

  /** kg_qualifier_join — read qualifier values off the best-ranked
    * statement (the time-items.rq:64–66 access path): each best
    * statement with its optional `since` date and the LABEL of its
    * optional `stated_in` entity ref (qualifier → entity → label
    * service, all left joins = SPARQL OPTIONAL). */
  def kgQualifierJoin(spark: SparkSession, dir: String): DataFrame = {
    val best = kgBestRank(spark, dir)
    val q = qualifiers(spark, dir)
    val since = q.filter(col("qp") === "since").select(col("sid"), col("q_oval").as("since"))
    val loc = q.filter(col("qp") === "stated_in").select(col("sid"), col("q_oid"))
    val labels = Triples.statements(spark, dir)
      .filter(col("p") === "label" && col("lang") === "en")
      .select(col("s").as("lid"), col("o_val").as("stated_in_label"))
    best.join(since, Seq("sid"), "left_outer")
      .join(loc, Seq("sid"), "left_outer")
      .join(labels, col("q_oid") === col("lid"), "left_outer")
      .select(col("sid"), col("s"), col("o_val"), col("stmt_rank"),
        col("since"), col("stated_in_label"))
  }

  // ---- typed temporal literals (kg_time_diff) -------------------------

  /** Graph A's date statements: order dates with a Wikibase precision
    * code (9=year, 10=month, 11=day), key-derived. */
  private def datesA(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      Triples.id(Triples.ORDER, col("o_orderkey")).as("s"),
      col("o_orderdate").cast("date").as("d"),
      (lit(9) + col("o_orderkey") % 3).cast("int").as("prec"))

  /** Graph B: the stale remote copy — every 7th statement missing,
    * every 5th date shifted +40 days, every 11th +3 days, and an
    * independently key-derived precision (the two graphs disagree on
    * how precisely they state the same fact). */
  private def datesB(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 7 =!= 0)
      .select(
        Triples.id(Triples.ORDER, col("o_orderkey")).as("s"),
        when(col("o_orderkey") % 5 === 0, date_add(col("o_orderdate").cast("date"), 40))
          .when(col("o_orderkey") % 11 === 0, date_add(col("o_orderdate").cast("date"), 3))
          .otherwise(col("o_orderdate").cast("date")).as("d"),
        expr("CAST(9 + (o_orderkey div 3) % 3 AS INT)").as("prec"))

  private val datesASql =
    s"""a AS (SELECT ${Triples.idSql(Triples.ORDER, "o_orderkey")} AS s,
       |  o_orderdate::DATE AS d, CAST(9 + o_orderkey % 3 AS INTEGER) AS prec FROM orders)""".stripMargin

  private val datesBSql =
    s"""b AS (SELECT ${Triples.idSql(Triples.ORDER, "o_orderkey")} AS s,
       |  CASE WHEN o_orderkey % 5 = 0 THEN o_orderdate::DATE + 40
       |       WHEN o_orderkey % 11 = 0 THEN o_orderdate::DATE + 3
       |       ELSE o_orderdate::DATE END AS d,
       |  CAST(9 + (o_orderkey // 3) % 3 AS INTEGER) AS prec
       |FROM orders WHERE o_orderkey % 7 <> 0)""".stripMargin

  /** kg_time_diff — compare two graphs' typed temporal literals at the
    * COARSER of the two stated precisions (time-items.rq:66: both
    * sides are rendered `value "/" precision` and judged same/not):
    * year-precision compares the year, month-precision year+month,
    * day-precision the full date. B-side-missing rows keep a NULL
    * verdict (the reference's OPTIONAL wd side). Composable with
    * kg_graph_diff: this is the typed-literal refinement of its
    * match/conflict classification. Scale: one equi-join on the
    * statement subject; the per-row precision math is codegen'd. */
  def kgTimeDiff(spark: SparkSession, dir: String): DataFrame = {
    val a = datesA(spark, dir)
    val b = datesB(spark, dir)
      .withColumnRenamed("d", "bd").withColumnRenamed("prec", "bprec")
    a.join(b, Seq("s"), "left_outer")
      .withColumn("cmp_prec", least(col("prec"), col("bprec")))
      .select(col("s"),
        concat(col("d").cast("string"), lit("/"), col("prec")).as("a_val"),
        concat(col("bd").cast("string"), lit("/"), col("bprec")).as("b_val"),
        col("cmp_prec"),
        when(col("bd").isNull, lit(null).cast("boolean"))
          .when(col("cmp_prec") === 9, year(col("d")) === year(col("bd")))
          .when(col("cmp_prec") === 10,
            year(col("d")) === year(col("bd")) && month(col("d")) === month(col("bd")))
          .otherwise(col("d") === col("bd")).as("is_same"))
  }

  // ---- property metadata (kg_prop_meta) -------------------------------

  /** The property dimension, derived from the ONE mapping-rule source
    * ([[Triples.rules]]) so dim and statement builder cannot drift:
    * property type (entity-valued → wikibase-item, literal → string —
    * `wikibase:propertyType`), a stable corresponding-external-property
    * id (the P343 analogue: WD_P100, WD_P101, … in property name
    * order), and the source tables the property appears on. */
  val propMeta: Seq[(String, String, String, String)] = {
    val byP = Triples.rules.groupBy(_.p).toSeq.sortBy(_._1)
    byP.zipWithIndex.map { case ((p, rs), i) =>
      val ptype = if (rs.head.oNs.isDefined) "wikibase-item" else "string"
      (p, ptype, s"WD_P${100 + i}", rs.map(_.table).distinct.sorted.mkString(","))
    }
  }

  /** kg_prop_meta — property introspection
    * (get_all_properties_with_corresponding_prop.rq): each property
    * with its type, corresponding external property, source tables,
    * and usage count in the statement store. The dimension is
    * dictionary-sized → broadcast; the census is one map-side-partial
    * groupBy over statements. */
  def kgPropMeta(spark: SparkSession, dir: String): DataFrame = {
    val sess = spark; import sess.implicits._
    val dim = propMeta.toDF("p", "property_type", "corr_property", "part_of")
    val census = Triples.statements(spark, dir)
      .groupBy(col("p")).agg(count(lit(1)).as("n_statements"))
    census.join(broadcast(dim), Seq("p"))
      .select(col("p"), col("property_type"), col("corr_property"),
        col("part_of"), col("n_statements"))
  }

  /** kg_valid_at — temporal statement validity: which statements were
    * in force on a reference date, judged from their `since` / `until`
    * qualifiers (the valid-time reading of the qualifier relation —
    * the reference's date qualifiers carry exactly this meaning on
    * FactGrid career/membership statements). A statement is valid at T
    * iff (no `since` or since ≤ T) and (no `until` or until > T) —
    * missing bounds are open intervals, and every statement keeps its
    * verdict row (OPTIONAL semantics, not a pre-filter).
    *
    * Scale shape: two left equi-joins on the long statement id — the
    * same co-bucketed statement/qualifier layout as
    * [[kgQualifierJoin]] serves both reads shuffle-free at 100 TB; the
    * interval compare is one codegen'd projection. Dates compare as
    * typed dates (cast from the ISO-rendered qualifier literal). */
  def kgValidAt(spark: SparkSession, dir: String): DataFrame = {
    val asOf = to_date(lit("1995-06-15"))
    val q = qualifiers(spark, dir)
    val since = q.filter(col("qp") === "since")
      .select(col("sid"), col("q_oval").cast("date").as("since"))
    val until = q.filter(col("qp") === "until")
      .select(col("sid"), col("q_oval").cast("date").as("until"))
    qualifiedStatements(spark, dir)
      .join(since, Seq("sid"), "left_outer")
      .join(until, Seq("sid"), "left_outer")
      .withColumn("valid_at",
        (col("since").isNull || col("since") <= asOf) &&
          (col("until").isNull || col("until") > asOf))
      .select(col("sid"), col("s"), col("p"), col("o_val"), col("stmt_rank"),
        col("since").cast("string").as("since"),
        col("until").cast("string").as("until"), col("valid_at"))
  }

  /** The sitelink relation `(s, site, name)` — the schema:about /
    * schema:isPartOf / schema:name reification the reference pivots
    * (get_wiki_sitelinks.rq:36–66). Synthesis is key-derived: every
    * customer has an enwiki article, every 2nd a dewiki one, every 3rd
    * a wikidata qid, every 5th a frwiki article. */
  def sitelinks(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    def link(site: String, cond: Column, name: Column) =
      c.filter(cond).select(cid.as("s"), lit(site).as("site"), name.as("name"))
    link("enwiki", lit(true), concat(lit("en:"), col("c_name")))
      .unionAll(link("dewiki", col("c_custkey") % 2 === 0, concat(lit("de:"), col("c_name"))))
      .unionAll(link("wikidata", col("c_custkey") % 3 === 0,
        concat(lit("Q"), col("c_custkey").cast("string"))))
      .unionAll(link("frwiki", col("c_custkey") % 5 === 0, concat(lit("fr:"), col("c_name"))))
  }

  private val sitelinksSql =
    s"""links AS (
       |  SELECT $cidSql AS s, 'enwiki' AS site, 'en:' || c_name AS name FROM customer
       |  UNION ALL
       |  SELECT $cidSql, 'dewiki', 'de:' || c_name FROM customer WHERE c_custkey % 2 = 0
       |  UNION ALL
       |  SELECT $cidSql, 'wikidata', 'Q' || c_custkey::VARCHAR FROM customer WHERE c_custkey % 3 = 0
       |  UNION ALL
       |  SELECT $cidSql, 'frwiki', 'fr:' || c_name FROM customer WHERE c_custkey % 5 = 0)""".stripMargin

  /** kg_sitelinks — the sitelink pivot (get_wiki_sitelinks.rq): each
    * entity with its label, its Wikidata item IRI (the
    * `BIND(IRI(CONCAT(...)))` transform, :41), and one column per
    * wiki's article name — missing links stay null (OPTIONAL).
    *
    * Spark-first shape: the reference expresses this as FIVE OPTIONAL
    * self-joins on the link reification; here it is ONE map-side-
    * partial conditional aggregation over the link relation (site
    * dictionary is fixed → the pivot is a projection per row, the
    * groupBy is the only shuffle) plus the label-service join. At
    * 100 TB: one pass over links, no self-join amplification. */
  def kgSitelinks(spark: SparkSession, dir: String): DataFrame = {
    def s(site: String) = max(when(col("site") === site, col("name")))
    val wide = sitelinks(spark, dir).groupBy(col("s"))
      .agg(s("wikidata").as("qid"), s("dewiki").as("s_dewiki"),
        s("enwiki").as("s_enwiki"), s("frwiki").as("s_frwiki"))
    val labels = Triples.statements(spark, dir)
      .filter(col("p") === "label" && col("lang") === "en")
      .select(col("s"), col("o_val").as("label"))
    wide.join(labels, Seq("s"), "left_outer")
      .select(col("s"), col("label"),
        when(col("qid").isNotNull, concat(lit("wd:"), col("qid"))).as("wd_item"),
        col("s_dewiki"), col("s_enwiki"), col("s_frwiki"))
  }

  /** kg_sample_distinct — SPARQL aggregate completers over a BGP
    * (SAMPLE + COUNT(DISTINCT), the dplyr n_distinct shapes in the
    * reference's analysis R): per nation, the number of distinct
    * customers, distinct market segments, and a deterministic SAMPLE
    * of the customer labels (min — the only SAMPLE that hash-checks
    * on a distributed engine). */
  def kgSampleDistinct(spark: SparkSession, dir: String): DataFrame = {
    val st = Triples.statements(spark, dir)
    val inN = st.filter(col("p") === "in_nation" &&
        col("s") >= lit(Triples.CUSTOMER * Triples.NS) &&
        col("s") < lit((Triples.CUSTOMER + 1) * Triples.NS))
      .select(col("s").as("c"), col("o_id").as("n"))
    val seg = st.filter(col("p") === "mktsegment").select(col("s").as("c"), col("o_val").as("segment"))
    val lbl = st.filter(col("p") === "label" && col("lang") === "en")
      .select(col("s").as("c"), col("o_val").as("label"))
    inN.join(seg, "c").join(lbl, "c")
      .groupBy(col("n"))
      .agg(countDistinct(col("c")).as("n_customers"),
        countDistinct(col("segment")).as("n_segments"),
        min(col("label")).as("sample_label"))
  }

  /** kg_geo_near — geographic proximity over coordinate statements
    * (the reference reads address → `?Geo` coordinates,
    * lokale-from-factgrid.rq:29–31, and maps them): entities inside a
    * bounding box around a center point, ranked by squared euclidean
    * distance in coordinate space.
    *
    * Determinism: distance is PURE ARITHMETIC (multiply/add on the
    * synthesized coordinates — no haversine: libm sin/cos are not
    * correctly-rounded and may differ across engines, so trig would
    * break the hash oracle; for ranking inside a small box, squared
    * euclidean on lat/lon is the standard cheap proxy). The box
    * predicate is codegen'd in the scan stage (it tests COMPUTED
    * columns, so it is not a parquet pushdown — a real dataset with
    * stored lat/lon columns would push it); the top-50
    * cut is a window rank with a total order. Coordinates are
    * key-derived (integer mod, one exact-rounded division) — the
    * lat/lon columns any real dataset would carry. */
  def kgGeoNear(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val pts = c.select(cid.as("s"),
      ((col("c_custkey") * 37 % 1800).cast("double") / 10.0 - 90.0).as("lat"),
      ((col("c_custkey") * 73 % 3600).cast("double") / 10.0 - 180.0).as("lon"))
    val (clat, clon, r) = (10.0, 20.0, 15.0)
    // top-50 via orderBy+limit = TakeOrderedAndProject (per-partition
    // heaps, driver receives 50 rows) — NOT a global window, which
    // would sort the whole box in one task; the rank window then runs
    // over the bounded 50-row result only
    val top = pts
      .filter(col("lat") >= clat - r && col("lat") <= clat + r &&
        col("lon") >= clon - r && col("lon") <= clon + r)
      .withColumn("dist2",
        (col("lat") - clat) * (col("lat") - clat) +
          (col("lon") - clon) * (col("lon") - clon))
      .orderBy(col("dist2"), col("s")).limit(50)
    top.withColumn("rk", row_number().over(Window.orderBy(col("dist2"), col("s"))))
      .select(col("s"), col("lat"), col("lon"), col("dist2"), col("rk"))
  }

  /** kg_export_qs — the publishing export: the statement store
    * rendered as QuickStatements-long rows (item, property, value) —
    * the exact format the reference pushes through
    * `long_for_quickstatements()` + `write_wikibase(format = "csv")`
    * (write-wikidata-ids-to-factgrid.R:31–40). Rendering rules follow
    * QS: entity-valued statements emit `Q<id>` values, literals emit
    * the quoted string, and labels emit under the `L<lang>` pseudo-
    * property instead of a P-id (QS's label namespace). Property ids
    * come from the ONE property dimension ([[propMeta]] — bounded,
    * broadcast); everything else is a codegen'd per-row projection at
    * scan speed. Composable upstream: feed it kg_upsert's delta to
    * export only what a publishing run would actually push. */
  def kgExportQs(spark: SparkSession, dir: String): DataFrame = {
    val sess = spark; import sess.implicits._
    val dim = propMeta.toDF("p", "property_type", "corr_property", "part_of")
      .select(col("p"), col("property_type"),
        regexp_replace(col("corr_property"), "^WD_", "").as("pid"))
    val st = Triples.statements(spark, dir)
    val labels = st.filter(col("p") === "label")
      .select(concat(lit("Q"), col("s")).as("item"),
        concat(lit("L"), col("lang")).as("property"),
        concat(lit("\""), col("o_val"), lit("\"")).as("value"))
    val claims = st.filter(col("p") =!= "label").join(broadcast(dim), Seq("p"))
      .select(concat(lit("Q"), col("s")).as("item"),
        col("pid").as("property"),
        when(col("property_type") === "wikibase-item", concat(lit("Q"), col("o_id")))
          .otherwise(concat(lit("\""), col("o_val"), lit("\""))).as("value"))
    labels.unionAll(claims)
  }

  /** kg_geo_zorder — the Z-order LAYOUT key for the coordinate
    * statements: quantize lat/lon to 16 bits, Morton-interleave them
    * (native [[graft.functions.Interleave16]], codegen'd in the scan
    * stage), and derive the 128×128 spatial cell from the top z bits.
    * This is the write-side primitive behind 2-D locality at 100 TB:
    * sorting/range-partitioning the store by `z` before writing puts
    * spatial neighbors in the same parquet files, so min/max file
    * stats prune bounding-box queries ([[kgGeoNear]]'s box) that a
    * one-column sort cannot — the Delta/Iceberg OPTIMIZE ZORDER shape
    * expressed as a plain deterministic column.
    *
    * Determinism: quantization is 3 IEEE ops + floor (identical in
    * any engine), the interleave is integer bit ops — the oracle
    * replays it as the 32-term shift-and-or composition. */
  def kgGeoZorder(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    val pts = Tables.customer(spark, dir).select(cid.as("s"),
      ((col("c_custkey") * 37 % 1800).cast("double") / 10.0 - 90.0).as("lat"),
      ((col("c_custkey") * 73 % 3600).cast("double") / 10.0 - 180.0).as("lon"))
    pts
      .withColumn("qlat", floor((col("lat") + 90.0) / 180.0 * 65535.0).cast("long"))
      .withColumn("qlon", floor((col("lon") + 180.0) / 360.0 * 65535.0).cast("long"))
      .withColumn("z", expr("interleave16(qlat, qlon)"))
      .withColumn("cell", expr("z div 262144")) // 2^18 → 14 top bits = 128×128 grid
      .select(col("s"), col("qlat"), col("qlon"), col("z"), col("cell"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kg_geo_zorder"      -> (kgGeoZorder _),
    "kg_geo_near"        -> (kgGeoNear _),
    "kg_export_qs"       -> (kgExportQs _),
    "kg_best_rank"       -> (kgBestRank _),
    "kg_qualifier_join"  -> (kgQualifierJoin _),
    "kg_time_diff"       -> (kgTimeDiff _),
    "kg_prop_meta"       -> (kgPropMeta _),
    "kg_valid_at"        -> (kgValidAt _),
    "kg_sitelinks"       -> (kgSitelinks _),
    "kg_sample_distinct" -> (kgSampleDistinct _))

  private val bestSql =
    s"""best AS (
       |  SELECT sid, s, p, o_val, stmt_rank FROM (
       |    SELECT sid, s, p, o_val, stmt_rank,
       |      $rankOrdSql AS ord,
       |      max($rankOrdSql) OVER (PARTITION BY s, p) AS best_ord
       |    FROM qstmt)
       |  WHERE ord = best_ord AND stmt_rank <> 'deprecated')""".stripMargin

  val oracles: Map[String, String] = Map(
    "kg_geo_zorder" -> {
      val zTerms = (0 until 16).flatMap(i => Seq(
        s"(((qlat >> $i) & 1) << ${2 * i + 1})",
        s"(((qlon >> $i) & 1) << ${2 * i})")).mkString(" | ")
      s"""WITH pts AS (
         |  SELECT $cidSql AS s,
         |    CAST(c_custkey * 37 % 1800 AS DOUBLE) / 10.0e0 - 90.0e0 AS lat,
         |    CAST(c_custkey * 73 % 3600 AS DOUBLE) / 10.0e0 - 180.0e0 AS lon
         |  FROM customer),
         |q AS (
         |  SELECT s,
         |    CAST(floor((lat + 90.0e0) / 180.0e0 * 65535.0e0) AS BIGINT) AS qlat,
         |    CAST(floor((lon + 180.0e0) / 360.0e0 * 65535.0e0) AS BIGINT) AS qlon
         |  FROM pts)
         |SELECT s, qlat, qlon, ($zTerms)::BIGINT AS z,
         |  (($zTerms) // 262144)::BIGINT AS cell
         |FROM q""".stripMargin
    },
    "kg_geo_near" ->
      s"""WITH pts AS (
         |  SELECT $cidSql AS s,
         |    CAST(c_custkey * 37 % 1800 AS DOUBLE) / 10.0e0 - 90.0e0 AS lat,
         |    CAST(c_custkey * 73 % 3600 AS DOUBLE) / 10.0e0 - 180.0e0 AS lon
         |  FROM customer),
         |boxed AS (
         |  SELECT s, lat, lon,
         |    (lat - 10.0e0) * (lat - 10.0e0) + (lon - 20.0e0) * (lon - 20.0e0) AS dist2
         |  FROM pts
         |  WHERE lat >= -5.0e0 AND lat <= 25.0e0 AND lon >= 5.0e0 AND lon <= 35.0e0)
         |SELECT s, lat, lon, dist2,
         |  CAST(row_number() OVER (ORDER BY dist2, s) AS INTEGER) AS rk
         |FROM boxed QUALIFY rk <= 50""".stripMargin,
    "kg_export_qs" -> {
      val dimValues = propMeta
        .map { case (p, t, c, _) => s"('$p', '$t', '$c')" }
        .mkString(",\n    ")
      s"""$T, dim(p, property_type, corr_property) AS (
         |  VALUES
         |    $dimValues)
         |SELECT 'Q' || s::VARCHAR AS item, 'L' || lang AS property,
         |  '"' || o_val || '"' AS value
         |FROM triples WHERE p = 'label'
         |UNION ALL
         |SELECT 'Q' || t.s::VARCHAR,
         |  regexp_replace(d.corr_property, '^WD_', ''),
         |  CASE WHEN d.property_type = 'wikibase-item' THEN 'Q' || t.o_id::VARCHAR
         |       ELSE '"' || t.o_val || '"' END
         |FROM triples t JOIN dim d ON d.p = t.p WHERE t.p <> 'label'""".stripMargin
    },
    "kg_best_rank" ->
      s"""WITH $qstmtSql,
         |$bestSql
         |SELECT sid, s, p, o_val, stmt_rank FROM best""".stripMargin,
    "kg_qualifier_join" ->
      s"""$T, $qstmtSql,
         |$qualsSql,
         |$bestSql
         |SELECT best.sid, best.s, best.o_val, best.stmt_rank,
         |  since.q_oval AS since, lbl.o_val AS stated_in_label
         |FROM best
         |LEFT JOIN (SELECT sid, q_oval FROM quals WHERE qp='since') since USING (sid)
         |LEFT JOIN (SELECT sid, q_oid FROM quals WHERE qp='stated_in') loc USING (sid)
         |LEFT JOIN (SELECT s, o_val FROM triples WHERE p='label' AND lang='en') lbl
         |  ON lbl.s = loc.q_oid""".stripMargin,
    "kg_time_diff" ->
      s"""WITH $datesASql,
         |$datesBSql
         |SELECT a.s,
         |  a.d::VARCHAR || '/' || a.prec::VARCHAR AS a_val,
         |  b.d::VARCHAR || '/' || b.prec::VARCHAR AS b_val,
         |  CAST(least(a.prec, b.prec) AS INTEGER) AS cmp_prec,
         |  CASE WHEN b.d IS NULL THEN NULL
         |       WHEN least(a.prec, b.prec) = 9 THEN year(a.d) = year(b.d)
         |       WHEN least(a.prec, b.prec) = 10
         |         THEN year(a.d) = year(b.d) AND month(a.d) = month(b.d)
         |       ELSE a.d = b.d END AS is_same
         |FROM a LEFT JOIN b ON a.s = b.s""".stripMargin,
    "kg_prop_meta" -> {
      val values = propMeta
        .map { case (p, t, c, pt) => s"('$p', '$t', '$c', '$pt')" }
        .mkString(",\n    ")
      s"""$T, dim(p, property_type, corr_property, part_of) AS (
         |  VALUES
         |    $values)
         |SELECT t.p, dim.property_type, dim.corr_property, dim.part_of,
         |  count(*) AS n_statements
         |FROM triples t JOIN dim ON dim.p = t.p
         |GROUP BY 1, 2, 3, 4""".stripMargin
    },
    "kg_valid_at" ->
      s"""WITH $qstmtSql,
         |$qualsSql
         |SELECT q.sid, q.s, q.p, q.o_val, q.stmt_rank,
         |  CAST(since.q_oval::DATE AS VARCHAR) AS since,
         |  CAST(until_.q_oval::DATE AS VARCHAR) AS "until",
         |  ((since.q_oval IS NULL OR since.q_oval::DATE <= DATE '1995-06-15')
         |   AND (until_.q_oval IS NULL OR until_.q_oval::DATE > DATE '1995-06-15')) AS valid_at
         |FROM qstmt q
         |LEFT JOIN (SELECT sid, q_oval FROM quals WHERE qp='since') since USING (sid)
         |LEFT JOIN (SELECT sid, q_oval FROM quals WHERE qp='until') until_ USING (sid)""".stripMargin,
    "kg_sitelinks" ->
      s"""$T, $sitelinksSql,
         |wide AS (
         |  SELECT s,
         |    max(CASE WHEN site = 'wikidata' THEN name END) AS qid,
         |    max(CASE WHEN site = 'dewiki' THEN name END) AS s_dewiki,
         |    max(CASE WHEN site = 'enwiki' THEN name END) AS s_enwiki,
         |    max(CASE WHEN site = 'frwiki' THEN name END) AS s_frwiki
         |  FROM links GROUP BY s)
         |SELECT w.s, lbl.o_val AS label,
         |  CASE WHEN w.qid IS NOT NULL THEN 'wd:' || w.qid END AS wd_item,
         |  w.s_dewiki, w.s_enwiki, w.s_frwiki
         |FROM wide w
         |LEFT JOIN (SELECT s, o_val FROM triples WHERE p='label' AND lang='en') lbl
         |  ON lbl.s = w.s""".stripMargin,
    "kg_sample_distinct" -> {
      val c0 = Triples.CUSTOMER * Triples.NS
      val c1 = (Triples.CUSTOMER + 1) * Triples.NS - 1
      s"""$T
         |SELECT inn.o_id AS n,
         |  count(DISTINCT inn.s) AS n_customers,
         |  count(DISTINCT seg.o_val) AS n_segments,
         |  min(lbl.o_val) AS sample_label
         |FROM (SELECT s, o_id FROM triples WHERE p='in_nation' AND s BETWEEN $c0 AND $c1) inn
         |JOIN (SELECT s, o_val FROM triples WHERE p='mktsegment') seg ON seg.s = inn.s
         |JOIN (SELECT s, o_val FROM triples WHERE p='label' AND lang='en') lbl ON lbl.s = inn.s
         |GROUP BY 1""".stripMargin
    })
}
