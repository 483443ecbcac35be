package graft.kg

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Exact.dayStr
import Triples.NS

/** RDF text serialization of the statement store — the reference's
  * actual shipped artifact: `data-modeling/create-rdf.py:16–21`
  * materializes the mapped graph and writes Turtle
  * (`save_rdf("output/kg_v1.ttl")`) and JSON-LD (`save_jsonld(...)`),
  * with IRIs templated from the `prefixes:` block of
  * `data-modeling/mappings/kg_v1.yml` (`ex_book:
  * "http://example.com/book/"`, `schema: "https://schema.org/"`).
  * Here the same round trip closes over [[Triples]]: namespaced
  * integer ids template back into per-entity-type IRIs, literals get
  * N-Triples escaping and language tags, the synthetic order-date arm
  * exercises typed-literal lexical forms (`"…"^^xsd:date`), and
  * rdf:type rows reify the namespace as the entity's class (the
  * `[a, schema:Book]` row of every kg_v1.yml mapping).
  *
  * Scale: all three exports are PROJECTION-ONLY — string concatenation
  * over the statement scan, whole-stage codegen, zero shuffle, zero
  * UDFs (escaping is a chain of native `replace` calls). At 100 TB
  * this runs at scan speed and writes straight out; the only
  * non-statement inputs are the per-table key scans of
  * [[Triples.entityIds]] (column-pruned) and the orders date column.
  */
object Rdf {

  private val Base = "http://example.com/"
  private val Xsd = "http://www.w3.org/2001/XMLSchema#"
  private val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

  private val nsNames = Seq(
    Triples.REGION -> "region", Triples.NATION -> "nation",
    Triples.CUSTOMER -> "customer", Triples.SUPPLIER -> "supplier",
    Triples.PART -> "part", Triples.ORDER -> "order")

  /** Entity-type segment of a namespaced id (codegen'd when-chain;
    * ids are < 7e12, so the double division is exact). */
  private def nsName(idc: Column): Column = {
    val ns = (idc / lit(NS)).cast("long")
    nsNames.tail.foldLeft(when(ns === nsNames.head._1.toLong, nsNames.head._2)) {
      case (acc, (n, s)) => acc.when(ns === n.toLong, s)
    }
  }
  private def key(idc: Column): Column = (idc % lit(NS)).cast("string")

  private def nsNameSql(e: String): String =
    s"CASE CAST(($e) // $NS AS INTEGER) " +
      nsNames.map { case (n, s) => s"WHEN $n THEN '$s'" }.mkString(" ") + " END"
  private def keySql(e: String): String = s"CAST(($e) % $NS AS VARCHAR)"

  /** N-Triples/Turtle/JSON string-literal escaping: backslash FIRST,
    * then quote, then the control characters (the W3C N-Triples
    * canonical set; same chain is valid for JSON strings). */
  private val escPairs = Seq(
    "\\" -> "\\\\", "\"" -> "\\\"", "\n" -> "\\n", "\r" -> "\\r", "\t" -> "\\t")
  private[graft] def esc(c: Column): Column =
    escPairs.foldLeft(c) { case (acc, (s, r)) =>
      call_function("replace", acc, lit(s), lit(r))
    }
  // chr() codes keep the SQL free of backslash-in-quote soup:
  // 92 backslash, 34 quote, 10 LF, 13 CR, 9 TAB.
  private def escSql(e: String): String = {
    val steps = Seq(
      ("chr(92)", "chr(92)||chr(92)"), ("chr(34)", "chr(92)||chr(34)"),
      ("chr(10)", "chr(92)||'n'"), ("chr(13)", "chr(92)||'r'"), ("chr(9)", "chr(92)||'t'"))
    steps.foldLeft(e) { case (acc, (s, r)) => s"replace($acc, $s, $r)" }
  }

  /** Absolute IRI (no brackets) for a namespaced id. */
  private def iriPlain(idc: Column): Column =
    concat(lit(Base), nsName(idc), lit("/"), key(idc))
  private def iriPlainSql(e: String): String =
    s"'$Base' || ${nsNameSql(e)} || '/' || ${keySql(e)}"
  /** Bracketed IRI term. */
  private def iri(idc: Column): Column = concat(lit("<"), iriPlain(idc), lit(">"))
  private def iriSql(e: String): String = s"'<' || ${iriPlainSql(e)} || '>'"

  /** The object term of a statement row in N-Triples form. */
  private def ntObject: Column =
    when(col("o_id").isNotNull, iri(col("o_id")))
      .when(col("lang").isNotNull,
        concat(lit("\""), esc(col("o_val")), lit("\"@"), col("lang")))
      .otherwise(concat(lit("\""), esc(col("o_val")), lit("\"")))
  private def ntObjectSql: String =
    s"""CASE WHEN o_id IS NOT NULL THEN ${iriSql("o_id")}
       |     WHEN lang IS NOT NULL THEN chr(34) || ${escSql("o_val")} || chr(34) || '@' || lang
       |     ELSE chr(34) || ${escSql("o_val")} || chr(34) END""".stripMargin

  /** kg_export_nt — the statement store rendered as N-Triples lines
    * (`create-rdf.py`'s `save_rdf`, in the line-based member of the
    * Turtle family; the reference's publishing dir ships `.nt`).
    * Three arms: statements (entity objects as IRIs, labels as
    * language-tagged literals, other literals escaped + quoted),
    * rdf:type rows from the entity-id universe, and the order-date
    * typed-literal arm (`"1996-01-02"^^xsd:date`). */
  def kgExportNt(spark: SparkSession, dir: String): DataFrame = {
    val stmts = Triples.statements(spark, dir).select(
      concat(iri(col("s")), lit(s" <${Base}prop/"), col("p"), lit("> "),
        ntObject, lit(" .")).as("nt"))
    val types = Triples.entityIds(spark, dir).select(
      concat(iri(col("id")), lit(s" <$RdfType> <${Base}class/"),
        nsName(col("id")), lit("> .")).as("nt"))
    val dates = Tables.orders(spark, dir).select(
      concat(lit(s"<${Base}order/"), col("o_orderkey").cast("string"),
        lit(s"> <${Base}prop/order_date> \""), dayStr(col("o_orderdate")),
        lit("\"^^<" + Xsd + "date> .")).as("nt"))
    stmts.unionAll(types).unionAll(dates)
  }

  private val prefixes: Seq[(String, String)] =
    nsNames.map { case (_, s) => s -> s"$Base$s/" } ++ Seq(
      "prop" -> s"${Base}prop/", "class" -> s"${Base}class/", "xsd" -> Xsd)

  /** Prefixed name for a namespaced id (`customer:42`). */
  private def pname(idc: Column): Column =
    concat(nsName(idc), lit(":"), key(idc))
  private def pnameSql(e: String): String =
    s"${nsNameSql(e)} || ':' || ${keySql(e)}"

  /** kg_export_ttl — the same graph in Turtle's compact form:
    * `@prefix` header rows plus prefixed-name body rows (`customer:42
    * prop:label "…"@en .`, rdf:type as the `a` keyword). Numeric
    * local names are valid Turtle 1.1 PN_LOCAL. The driver's
    * row-sorted hash makes header/body emission order immaterial;
    * a file writer would `ORDER BY` a header-first key. */
  def kgExportTtl(spark: SparkSession, dir: String): DataFrame = {
    val sess = spark; import sess.implicits._
    val header = prefixes.map { case (p, iriv) => s"@prefix $p: <$iriv> ." }.toDF("ttl")
    val obj =
      when(col("o_id").isNotNull, pname(col("o_id")))
        .when(col("lang").isNotNull,
          concat(lit("\""), esc(col("o_val")), lit("\"@"), col("lang")))
        .otherwise(concat(lit("\""), esc(col("o_val")), lit("\"")))
    val stmts = Triples.statements(spark, dir).select(
      concat(pname(col("s")), lit(" prop:"), col("p"), lit(" "), obj, lit(" .")).as("ttl"))
    val types = Triples.entityIds(spark, dir).select(
      concat(pname(col("id")), lit(" a class:"), nsName(col("id")), lit(" .")).as("ttl"))
    val dates = Tables.orders(spark, dir).select(
      concat(lit("order:"), col("o_orderkey").cast("string"),
        lit(" prop:order_date \""), dayStr(col("o_orderdate")),
        lit("\"^^xsd:date .")).as("ttl"))
    header.unionAll(stmts).unionAll(types).unionAll(dates)
  }

  /** kg_export_jsonld — `create-rdf.py`'s `save_jsonld(...)` as
    * line-delimited FLAT JSON-LD: one node object per statement
    * (`{"@id":…, "<prop IRI>": {"@id"|"@value"[, "@language"]}}`),
    * plus `@type` nodes from the entity universe. Flat form keeps the
    * export embarrassingly parallel — compaction/framing is a client
    * step, grouping by subject would force a shuffle the line format
    * doesn't need. */
  def kgExportJsonld(spark: SparkSession, dir: String): DataFrame = {
    val objNode =
      when(col("o_id").isNotNull,
        concat(lit("{\"@id\":\""), iriPlain(col("o_id")), lit("\"}")))
        .when(col("lang").isNotNull,
          concat(lit("{\"@value\":\""), esc(col("o_val")),
            lit("\",\"@language\":\""), col("lang"), lit("\"}")))
        .otherwise(concat(lit("{\"@value\":\""), esc(col("o_val")), lit("\"}")))
    val stmts = Triples.statements(spark, dir).select(
      concat(lit("{\"@id\":\""), iriPlain(col("s")), lit(s"\",\"${Base}prop/"),
        col("p"), lit("\":"), objNode, lit("}")).as("jsonld"))
    val types = Triples.entityIds(spark, dir).select(
      concat(lit("{\"@id\":\""), iriPlain(col("id")),
        lit(s"\",\"@type\":\"${Base}class/"), nsName(col("id")), lit("\"}")).as("jsonld"))
    stmts.unionAll(types)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kg_export_nt"     -> (kgExportNt _),
    "kg_export_ttl"    -> (kgExportTtl _),
    "kg_export_jsonld" -> (kgExportJsonld _))

  private val T = Triples.sqlCte

  val oracles: Map[String, String] = Map(
    "kg_export_nt" ->
      s"""$T
         |SELECT ${iriSql("s")} || ' <${Base}prop/' || p || '> ' ||
         |  ($ntObjectSql) || ' .' AS nt
         |FROM triples
         |UNION ALL
         |SELECT ${iriSql("id")} || ' <$RdfType> <${Base}class/' ||
         |  ${nsNameSql("id")} || '> .'
         |FROM ${Triples.entityIdsSql} ids
         |UNION ALL
         |SELECT '<${Base}order/' || CAST(o_orderkey AS VARCHAR) ||
         |  '> <${Base}prop/order_date> ' || chr(34) ||
         |  strftime(o_orderdate, '%Y-%m-%d') || chr(34) || '^^<${Xsd}date> .'
         |FROM orders""".stripMargin,
    "kg_export_ttl" -> {
      val header = prefixes
        .map { case (p, iriv) => s"SELECT '@prefix $p: <$iriv> .' AS ttl" }
        .mkString("\nUNION ALL ")
      s"""$T
         |$header
         |UNION ALL
         |SELECT ${pnameSql("s")} || ' prop:' || p || ' ' ||
         |  (CASE WHEN o_id IS NOT NULL THEN ${pnameSql("o_id")}
         |        WHEN lang IS NOT NULL THEN chr(34) || ${escSql("o_val")} || chr(34) || '@' || lang
         |        ELSE chr(34) || ${escSql("o_val")} || chr(34) END) || ' .'
         |FROM triples
         |UNION ALL
         |SELECT ${pnameSql("id")} || ' a class:' || ${nsNameSql("id")} || ' .'
         |FROM ${Triples.entityIdsSql} ids
         |UNION ALL
         |SELECT 'order:' || CAST(o_orderkey AS VARCHAR) || ' prop:order_date ' ||
         |  chr(34) || strftime(o_orderdate, '%Y-%m-%d') || chr(34) || '^^xsd:date .'
         |FROM orders""".stripMargin
    },
    "kg_export_jsonld" ->
      s"""$T
         |SELECT '{' || chr(34) || '@id' || chr(34) || ':' || chr(34) ||
         |    ${iriPlainSql("s")} || chr(34) || ',' || chr(34) ||
         |    '${Base}prop/' || p || chr(34) || ':' ||
         |  (CASE WHEN o_id IS NOT NULL THEN
         |      '{' || chr(34) || '@id' || chr(34) || ':' || chr(34) || ${iriPlainSql("o_id")} || chr(34) || '}'
         |    WHEN lang IS NOT NULL THEN
         |      '{' || chr(34) || '@value' || chr(34) || ':' || chr(34) || ${escSql("o_val")} || chr(34) ||
         |      ',' || chr(34) || '@language' || chr(34) || ':' || chr(34) || lang || chr(34) || '}'
         |    ELSE '{' || chr(34) || '@value' || chr(34) || ':' || chr(34) || ${escSql("o_val")} || chr(34) || '}'
         |   END) || '}' AS jsonld
         |FROM triples
         |UNION ALL
         |SELECT '{' || chr(34) || '@id' || chr(34) || ':' || chr(34) || ${iriPlainSql("id")} || chr(34) ||
         |  ',' || chr(34) || '@type' || chr(34) || ':' || chr(34) ||
         |  '${Base}class/' || ${nsNameSql("id")} || chr(34) || '}'
         |FROM ${Triples.entityIdsSql} ids""".stripMargin)
}
