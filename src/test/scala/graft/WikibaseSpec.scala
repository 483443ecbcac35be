package graft

import org.apache.spark.sql.functions._
import graft.kg.{Triples, Wikibase}

class WikibaseSpec extends SparkSpec {

  test("every wikibase query runs, has rows, and a matching oracle") {
    Wikibase.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
      assert(Wikibase.oracles.contains(name), s"$name missing oracle SQL")
    }
  }

  test("best_rank implements wikibase BestRank semantics") {
    val nCust = spark.read.parquet(s"$sf/customer.parquet").count()
    val best = Wikibase.kgBestRank(spark, sf).collect()
    // deprecated is never best
    assert(!best.exists(_.getAs[String]("stmt_rank") == "deprecated"))
    val bySubject = best.groupBy(_.getAs[Long]("s"))
    // every customer has a best statement (all carry a normal-rank value)
    assert(bySubject.size == nCust)
    bySubject.foreach { case (s, rows) =>
      val ranks = rows.map(_.getAs[String]("stmt_rank")).distinct
      // preferred shadows normal: a subject never mixes ranks in its best set
      assert(ranks.length == 1, s"subject $s mixes ranks: ${ranks.toSeq}")
      val k = s - Triples.CUSTOMER * Triples.NS
      if (k % 6 == 0) {
        assert(ranks.head == "preferred", s"subject $s should prefer UPGRADED")
        assert(rows.map(_.getAs[String]("o_val")).toSet == Set("UPGRADED"))
      } else assert(ranks.head == "normal")
    }
  }

  test("qualifier_join resolves since + stated_in label only where defined") {
    val rows = Wikibase.kgQualifierJoin(spark, sf).collect()
    val nations = spark.read.parquet(s"$sf/nation.parquet")
      .select("n_name").collect().map(_.getString(0)).toSet
    rows.foreach { r =>
      val sid = r.getAs[Long]("sid")
      if (sid % 10 == 0) { // current statement: carries both qualifiers
        assert(r.getAs[String]("since") != null)
        assert(nations.contains(r.getAs[String]("stated_in_label")))
      } else { // preferred override: no qualifiers attached
        assert(r.getAs[String]("since") == null)
        assert(r.getAs[String]("stated_in_label") == null)
      }
    }
  }

  test("time_diff compares at the coarser precision and keeps OPTIONAL nulls") {
    val rows = Wikibase.kgTimeDiff(spark, sf).collect()
    assert(rows.length == spark.read.parquet(s"$sf/orders.parquet").count())
    rows.foreach { r =>
      val aVal = r.getAs[String]("a_val")
      val bVal = r.getAs[String]("b_val")
      if (bVal == null) assert(r.isNullAt(r.fieldIndex("is_same")))
      else {
        val Array(ad, ap) = aVal.split("/"); val Array(bd, bp) = bVal.split("/")
        val cmp = math.min(ap.toInt, bp.toInt)
        assert(r.getAs[Int]("cmp_prec") == cmp)
        val expected = cmp match {
          case 9  => ad.take(4) == bd.take(4)
          case 10 => ad.take(7) == bd.take(7)
          case _  => ad == bd
        }
        assert(r.getAs[Boolean]("is_same") == expected, s"row $r")
      }
    }
    // the synthesis actually produces all three verdicts
    val verdicts = rows.map(r => if (r.isNullAt(r.fieldIndex("is_same"))) "null"
      else r.getAs[Boolean]("is_same").toString).toSet
    assert(verdicts == Set("true", "false", "null"))
  }

  test("prop_meta covers every predicate in the store with consistent types") {
    val rows = Wikibase.kgPropMeta(spark, sf).collect()
    val storePs = Triples.statements(spark, sf).select("p").distinct()
      .collect().map(_.getString(0)).toSet
    assert(rows.map(_.getAs[String]("p")).toSet == storePs)
    val entityPs = Triples.rules.filter(_.oNs.isDefined).map(_.p).toSet
    rows.foreach { r =>
      val expected = if (entityPs(r.getAs[String]("p"))) "wikibase-item" else "string"
      assert(r.getAs[String]("property_type") == expected)
      assert(r.getAs[String]("corr_property").startsWith("WD_P"))
      assert(r.getAs[Long]("n_statements") > 0)
    }
    // corresponding ids are distinct (it's a 1:1 external mapping)
    assert(rows.map(_.getAs[String]("corr_property")).distinct.length == rows.length)
  }

  test("valid_at implements open-interval since/until semantics") {
    val asOf = java.sql.Date.valueOf("1995-06-15")
    val rows = Wikibase.kgValidAt(spark, sf).collect()
    // one verdict row per statement — validity is not a pre-filter
    assert(rows.length == Wikibase.qualifiedStatements(spark, sf).count())
    rows.foreach { r =>
      val since = Option(r.getAs[String]("since")).map(java.sql.Date.valueOf)
      val until = Option(r.getAs[String]("until")).map(java.sql.Date.valueOf)
      val expected = since.forall(!_.after(asOf)) && until.forall(_.after(asOf))
      assert(r.getAs[Boolean]("valid_at") == expected, s"row $r")
      // qualifier placement follows the synthesis: since on current
      // statements, until on deprecated, nothing on preferred
      (r.getAs[Long]("sid") % 10) match {
        case 0 => assert(since.isDefined && until.isEmpty)
        case 1 => assert(since.isEmpty && until.isDefined)
        case _ => assert(since.isEmpty && until.isEmpty)
      }
    }
    // the data exercises both verdicts
    assert(rows.exists(_.getAs[Boolean]("valid_at")))
    assert(rows.exists(!_.getAs[Boolean]("valid_at")))
  }

  test("sitelinks pivot: one row per entity, OPTIONAL columns follow the synthesis") {
    val rows = Wikibase.kgSitelinks(spark, sf).collect()
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(rows.length == cust.size) // every customer has an enwiki link
    rows.foreach { r =>
      val k = r.getAs[Long]("s") - Triples.CUSTOMER * Triples.NS
      val name = cust(k)
      assert(r.getAs[String]("s_enwiki") == s"en:$name")
      assert(Option(r.getAs[String]("s_dewiki")).isDefined == (k % 2 == 0))
      assert(Option(r.getAs[String]("wd_item")) ==
        (if (k % 3 == 0) Some(s"wd:Q$k") else None))
      assert(Option(r.getAs[String]("s_frwiki")).isDefined == (k % 5 == 0))
      assert(r.getAs[String]("label") != null) // label service resolves
    }
  }

  test("export_qs renders QuickStatements rows for every statement") {
    val rows = Wikibase.kgExportQs(spark, sf).collect()
    val st = Triples.statements(spark, sf)
    assert(rows.length == st.count())
    rows.foreach { r =>
      assert(r.getAs[String]("item").startsWith("Q"))
      val p = r.getAs[String]("property")
      val v = r.getAs[String]("value")
      if (p.startsWith("L")) // label namespace: Len/Lde/…, quoted value
        assert(v.startsWith("\"") && v.endsWith("\""))
      else {
        assert(p.startsWith("P"), s"property $p")
        // entity values are Q-ids, literals are quoted
        assert(v.startsWith("Q") || (v.startsWith("\"") && v.endsWith("\"")), s"value $v")
      }
    }
    // both value classes are actually exercised
    assert(rows.exists(r => r.getAs[String]("value").startsWith("Q")))
    assert(rows.exists(r => r.getAs[String]("property").startsWith("L")))
  }

  test("geo_near: box membership, exact distances, dense ascending ranks") {
    val rows = Wikibase.kgGeoNear(spark, sf).collect().sortBy(_.getAs[Int]("rk"))
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      val (lat, lon) = (r.getAs[Double]("lat"), r.getAs[Double]("lon"))
      assert(lat >= -5.0 && lat <= 25.0 && lon >= 5.0 && lon <= 35.0)
      val d2 = (lat - 10.0) * (lat - 10.0) + (lon - 20.0) * (lon - 20.0)
      assert(r.getAs[Double]("dist2") == d2)
    }
    assert(rows.map(_.getAs[Int]("rk")).toSeq == (1 to rows.length))
    val d = rows.map(_.getAs[Double]("dist2"))
    assert(d.zip(d.tail).forall { case (a, b) => a <= b })
  }

  test("geo_zorder: z decodes back to the quantized coordinates, cells bound both axes") {
    val rows = Wikibase.kgGeoZorder(spark, sf)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    def unspread(v: Long): Long =
      (0 until 16).map(i => ((v >> (2 * i)) & 1L) << i).reduce(_ | _)
    rows.foreach { case (qlat, qlon, z, _) =>
      assert(unspread(z >> 1) == qlat && unspread(z) == qlon, s"z=$z not bijective")
    }
    // a cell (top 14 z bits = top 7 bits per axis) bounds BOTH axes to
    // a 512-quantized-unit square — the 2-D locality a 1-D sort lacks
    rows.groupBy(_._4).foreach { case (cell, pts) =>
      val lats = pts.map(_._1); val lons = pts.map(_._2)
      assert(lats.max - lats.min < 512, s"cell $cell lat spread ${lats.max - lats.min}")
      assert(lons.max - lons.min < 512, s"cell $cell lon spread ${lons.max - lons.min}")
    }
  }

  test("sample_distinct: per-nation distinct counts match a direct computation") {
    val got = Wikibase.kgSampleDistinct(spark, sf).collect()
      .map(r => r.getAs[Long]("n") ->
        (r.getAs[Long]("n_customers"), r.getAs[Long]("n_segments"), r.getAs[String]("sample_label")))
      .toMap
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_nationkey", "c_name", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getString(2), r.getString(3)))
    cust.groupBy(_._2).foreach { case (nk, rows) =>
      val (nc, ns, lbl) = got(Triples.NATION * Triples.NS + nk)
      assert(nc == rows.map(_._1).distinct.length.toLong)
      assert(ns == rows.map(_._4).distinct.length.toLong)
      assert(lbl == rows.map(_._3).min)
    }
  }

  test("no silent codegen fallback fired in any suite run before this point") {
    // this suite sorts near the end of the run, so the JVM-wide janino
    // error counter has seen (almost) every composed plan by now
    SparkSpec.assertNoCodegenFallback("WikibaseSpec")
  }
}
