package graft

import org.apache.spark.sql.functions._

import graft.kg.{Rdf, Triples}
import graft.sources.Tables

class RdfSpec extends SparkSpec {

  test("esc: N-Triples escaping handles backslash first, then quote and controls") {
    import spark.implicits._
    val out = Seq("a\\b\"c\nd\re\tf", "plain").toDF("v")
      .select(Rdf.esc(col("v")).as("e")).collect().map(_.getString(0))
    assert(out(0) == "a\\\\b\\\"c\\nd\\re\\tf", s"got ${out(0)}")
    assert(out(1) == "plain")
  }

  test("kg_export_nt: every line is a well-formed triple; arm counts add up") {
    val nt = Rdf.kgExportNt(spark, sf)
    val rows = nt.collect().map(_.getString(0))
    assert(rows.forall(_.endsWith(" .")), "every N-Triples line ends with ' .'")
    assert(rows.forall(_.startsWith("<http://example.com/")), "subjects are templated IRIs")
    // one row per statement + one rdf:type row per entity + one typed
    // date literal per order
    val expected = Triples.statements(spark, sf).count() +
      Triples.entityIds(spark, sf).count() +
      Tables.orders(spark, sf).count()
    assert(rows.length.toLong == expected)
    // the three object forms all occur: IRI, lang-tagged, typed
    assert(rows.exists(_.contains("\"@en ")), "lang-tagged literal arm")
    assert(rows.exists(_.contains("^^<http://www.w3.org/2001/XMLSchema#date>")), "typed-literal arm")
    assert(rows.exists(_.matches(""".* <http://example\.com/prop/in_region> <http://example\.com/region/\d+> \.""")),
      "entity-object arm")
    assert(rows.exists(_.contains("22-rdf-syntax-ns#type")), "rdf:type arm")
  }

  test("kg_export_ttl: prefix header covers every prefix the body uses") {
    val rows = Rdf.kgExportTtl(spark, sf).collect().map(_.getString(0))
    val headers = rows.filter(_.startsWith("@prefix "))
    val declared = headers.map(_.split(" ")(1).stripSuffix(":")).toSet
    assert(declared == Set("region", "nation", "customer", "supplier", "part", "order",
      "prop", "class", "xsd"), s"got $declared")
    val body = rows.filterNot(_.startsWith("@prefix "))
    val usedPrefixes = body.flatMap(_.split("[ (]").filter(_.contains(":"))
      .map(_.takeWhile(_ != ':')).filter(_.nonEmpty).filterNot(_.startsWith("\"")))
    assert(usedPrefixes.toSet.subsetOf(declared), s"undeclared prefixes: ${usedPrefixes.toSet -- declared}")
    assert(body.forall(_.endsWith(" .")))
  }

  test("kg_export_jsonld: every line parses as a JSON object with @id or @value") {
    val sess = spark; import sess.implicits._
    val ds = Rdf.kgExportJsonld(spark, sf).as[String]
    val parsed = spark.read.json(ds)
    assert(!parsed.columns.contains("_corrupt_record"), "all lines must be valid JSON")
    val n = ds.count()
    assert(parsed.filter(col("`@id`").isNotNull).count() == n, "every node carries @id")
  }

  test("kg_import_nt: parse(render(store)) reproduces the statement store exactly") {
    val imported = Rdf.kgImportNt(spark, sf)
    val stmts = Triples.statements(spark, sf)
    val impStmts = imported.filter(col("p") =!= "a" && col("p") =!= "order_date")
    assert(impStmts.exceptAll(stmts).count() == 0 &&
      stmts.exceptAll(impStmts).count() == 0,
      "round-tripped statements must be multiset-equal to the store")
    assert(imported.filter(col("p") === "a").count() ==
      Triples.entityIds(spark, sf).count(), "one rdf:type row per entity survives the trip")
    assert(imported.filter(col("p") === "order_date").count() ==
      Tables.orders(spark, sf).count(), "one typed date literal per order survives the trip")
  }

  test("parseNt: unescape round-trips gnarly literals (incl. literal backslash-n)") {
    import spark.implicits._
    // raw backslash+n, real newline, quote, tab, trailing backslash —
    // the cases a naive reverse-replace chain gets wrong
    val gnarly = "a\\nb\nc\"d\te\\"
    val line = Seq(gnarly).toDF("v").select(concat(
      lit("<http://example.com/part/1> <http://example.com/prop/label> \""),
      Rdf.esc(col("v")), lit("\"@en .")).as("nt"))
    val r = Rdf.parseNt(line).collect()(0)
    assert(r.getAs[Long]("s") == 5L * Triples.NS + 1)
    assert(r.getAs[String]("p") == "label")
    assert(r.getAs[String]("o_val") == gnarly,
      s"unescape must invert escape; got ${r.getAs[String]("o_val")}")
    assert(r.getAs[String]("lang") == "en")
    assert(r.isNullAt(r.fieldIndex("o_id")))
  }

  test("kg_import_ttl: Turtle and N-Triples parse to IDENTICAL statements; header drives resolution") {
    val viaTtl = Rdf.kgImportTtl(spark, sf)
    val viaNt = Rdf.kgImportNt(spark, sf)
    assert(viaTtl.exceptAll(viaNt).count() == 0 && viaNt.exceptAll(viaTtl).count() == 0,
      "the two serializations must decode to the same statement multiset")
    // the prefix header is load-bearing: drop the customer prefix row
    // and exactly the customer-SUBJECT rows disappear (strict parser).
    // The crippled lines are MATERIALIZED before parsing, exactly as
    // kgImportTtl's linesMemo does for its own input: parseTtl over a
    // live render pipeline is the documented fused-render anti-pattern
    // (CollapseProject + filter pushdown substitute the whole
    // render+parse tree into every downstream predicate — the
    // o_id/o_val strictness count below rode that straight past the
    // 64 KB codegen cliff, 23 silent interpreted fallbacks)
    val full = Rdf.kgExportTtl(spark, sf)
    val crippled = full.filter(!col("ttl").startsWith("@prefix customer:")).localCheckpoint()
    val parsed = Rdf.parseTtl(crippled)
    val cust = (c: org.apache.spark.sql.Column) =>
      c >= 3L * Triples.NS && c < 4L * Triples.NS
    val lostSubjects = viaTtl.filter(cust(col("s")))
    val lostObjects = viaTtl.filter(!cust(col("s")) && col("o_id").isNotNull && cust(col("o_id")))
    assert(parsed.count() == viaTtl.count() - lostSubjects.count() - lostObjects.count(),
      "an undeclared prefix must drop its subject rows AND its entity-object rows")
    assert(parsed.filter(cust(col("s"))).count() == 0)
    // never a corrupted no-object statement: every surviving row has an
    // entity object, a literal, or is an rdf:type row
    assert(parsed.filter(col("o_id").isNull && col("o_val").isNull).count() == 0,
      "no row may survive with neither o_id nor o_val")
  }

  test("parseTtl: a non-canonical predicate or malformed object drops strictly") {
    val sess = spark; import sess.implicits._
    // header declares both prefixes, but `pr:` is not the canonical
    // predicate dialect (`a` / `prop:`) — the line must DROP, not
    // survive as a (p='', o_id=null, o_val=null) corrupted statement
    val lines = Seq(
      "@prefix customer: <http://example.com/customer/> .",
      "@prefix pr: <http://example.com/prop/> .",
      "customer:1 pr:label \"x\" .",          // foreign predicate form
      "customer:2 prop:label \"kept\" .",     // canonical — survives
      "customer:3 prop:label no-closing-dot", // malformed object
      "customer:4 a class:customer .").toDF("ttl")
    val parsed = Rdf.parseTtl(lines).collect()
    assert(parsed.length == 2, s"expected 2 strict survivors, got ${parsed.toSeq}")
    assert(parsed.forall(r => !(r.isNullAt(r.fieldIndex("o_id")) &&
      r.isNullAt(r.fieldIndex("o_val")))), "corrupted row survived the strict parse")
    assert(parsed.exists(r => r.getAs[String]("p") == "label" &&
      r.getAs[String]("o_val") == "kept"))
    assert(parsed.exists(r => r.getAs[String]("p") == "a"))
  }

  test("import fails LOUDLY on a literal containing the U+0001 unescape sentinel") {
    val sess = spark; import sess.implicits._
    // a non-normalized foreign corpus smuggling the sentinel must be an
    // error, never silently corrupted o_val bytes (round-9 ADVICE)
    val line = Seq(
      "<http://example.com/part/1> <http://example.com/prop/label> \"badlit\" .").toDF("nt")
    val e = intercept[Exception] {
      Rdf.parseNt(line).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("sentinel")),
      s"expected the loud sentinel message, got: ${messages(e).mkString(" | ")}")
  }

  test("rdf exports are projection-only: no exchange in any arm") {
    Seq(Rdf.kgExportNt(spark, sf), Rdf.kgExportTtl(spark, sf),
      Rdf.kgExportJsonld(spark, sf)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      // the only shuffles allowed are the DISTINCT branches the
      // statement store itself declares (lineitem edge maps)
      val exchanges = plan.linesIterator.count(_.contains("Exchange"))
      val distinctBranches = Triples.rules.count(_.distinct)
      assert(exchanges <= distinctBranches * 2,
        s"export should add no shuffle beyond the store's DISTINCT branches:\n$plan")
    }
  }

  test("production path: export to files, re-import via spark.read.text, identical statements") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rdf_files").toString
    graft.sources.Ingest.writeText(Rdf.kgExportNt(spark, sf), s"$dir/nt")
    graft.sources.Ingest.writeText(Rdf.kgExportTtl(spark, sf), s"$dir/ttl")
    val ntFile = Rdf.kgImportNtFile(spark, s"$dir/nt")
    val ttlFile = Rdf.kgImportTtlFile(spark, s"$dir/ttl")
    val inSession = Rdf.kgImportNt(spark, sf)
    assert(ntFile.exceptAll(inSession).count() == 0 &&
      inSession.exceptAll(ntFile).count() == 0,
      "file-read NT import must equal the in-session render round trip")
    assert(ttlFile.exceptAll(inSession).count() == 0 &&
      inSession.exceptAll(ttlFile).count() == 0,
      "file-read TTL import must equal the in-session render round trip")
    // and the production plan really is a leaf file scan — no render,
    // no checkpointed RDD scan under the parse
    val plan = ntFile.queryExecution.executedPlan.toString
    assert(plan.contains("FileScan text"), s"expected a text file scan, got:\n$plan")
    assert(!plan.contains("Scan ExistingRDD"),
      "production import must not read a checkpoint/render RDD")
  }

  test("no silent codegen fallback fired anywhere in this suite's compositions") {
    // the round-10 blind spot: the per-query gate can't see plans that
    // only exist inside specs (render→parse→exceptAll compositions);
    // this catches the runtime janino ERROR those plans would log
    SparkSpec.assertNoCodegenFallback("RdfSpec")
  }
}
