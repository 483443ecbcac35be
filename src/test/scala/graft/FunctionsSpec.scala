package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

class FunctionsSpec extends SparkSpec {

  test("cosine_sim matches the zip_with/aggregate fold bit-for-bit") {
    GraftFunctions.registerAll(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = e.select(col("vec_id").as("ia"), col("v").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("v").as("vb"))
    val pairs = a.join(b, col("ia") < col("ib")).limit(2000)
      .withColumn("native", expr("cosine_sim(va, vb)"))
      .withColumn("folded",
        expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (acc, x) -> acc + x)") /
          (sqrt(expr("aggregate(zip_with(va, va, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")) *
           sqrt(expr("aggregate(zip_with(vb, vb, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"))))
    assert(pairs.filter(col("native") =!= col("folded")).count() == 0)
  }

  test("cosine_sim of a vector with itself is 1.0") {
    GraftFunctions.registerAll(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("v"))
    val n = e.withColumn("c", expr("cosine_sim(v, v)"))
      .filter(abs(col("c") - 1.0) > 1e-12).count()
    assert(n == 0)
  }

  test("md5 word functions equal the hex-substring/conv composition") {
    GraftFunctions.registerAll(spark)
    val sess = spark; import sess.implicits._
    // cover: empty, 1-char, ascii, spaces, punctuation, non-ascii
    val docs = Seq("", "a", "hello world", "  spaced  ", "x|y|z", "héllo ünïcode", "0123456789abcdef")
      .toDF("s")
      .unionAll(spark.read.parquet(s"$sf/documents.parquet")
        .select(substring(col("text"), 1, 40).as("s")).limit(200))
    val checked = docs.select(
      call_function("md5_hi32", col("s")).as("n_hi"),
      conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long").as("c_hi"),
      call_function("md5_lo32", col("s")).as("n_lo"),
      conv(substring(md5(col("s")), 9, 8), 16, 10).cast("long").as("c_lo"),
      call_function("md5_p60", col("s")).as("n_p"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("c_p"))
    assert(checked.filter(
      col("n_hi") =!= col("c_hi") || col("n_lo") =!= col("c_lo") || col("n_p") =!= col("c_p"))
      .count() == 0)
    // null propagation matches the composition (null in, null out)
    val nulls = Seq[Option[String]](None).toDF("s")
      .select(call_function("md5_p60", col("s")).as("v")).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("hamming64 equals bit_count(xor)") {
    GraftFunctions.registerAll(spark)
    val df = spark.range(1000).selectExpr("id", "xxhash64(id) AS a", "xxhash64(id + 7) AS b")
      .withColumn("h1", expr("hamming64(a, b)"))
      .withColumn("h2", bit_count(col("a").bitwiseXOR(col("b"))))
    assert(df.filter(col("h1") =!= col("h2")).count() == 0)
  }

  test("interleave16 equals the shift-and-or composition, reference impl, and masks high bits") {
    GraftFunctions.registerAll(spark)
    val comp = (0 until 16).flatMap(i => Seq(
      s"((shiftright(a, $i) & 1L) << ${2 * i + 1})",
      s"((shiftright(b, $i) & 1L) << ${2 * i})")).mkString(" | ")
    val df = spark.range(2000)
      .selectExpr("id", "(id * 2654435761) % 65536 AS a", "(id * 40503) % 65536 AS b")
      .withColumn("zn", expr("interleave16(a, b)"))
      .withColumn("zc", expr(comp))
    assert(df.filter(col("zn") =!= col("zc")).count() == 0)
    // scala reference round trip: de-interleave recovers both inputs
    df.limit(100).collect().foreach { r =>
      val (a, b, z) = (r.getLong(1), r.getLong(2), r.getLong(3))
      def unspread(v: Long): Long =
        (0 until 16).map(i => ((v >> (2 * i)) & 1L) << i).reduce(_ | _)
      assert(unspread(z >> 1) == a && unspread(z) == b, s"z=$z not bijective for ($a,$b)")
    }
    // inputs beyond 16 bits are masked, not wrapped into neighbors' bits
    val big = spark.sql("SELECT interleave16(65536L + 3L, 2L) AS z").head().getLong(0)
    val small = spark.sql("SELECT interleave16(3L, 2L) AS z").head().getLong(0)
    assert(big == small)
  }

  test("extensions injection: functions available without registerAll") {
    // SparkSpec's session comes from GraftSession.builder, which wires
    // GraftExtensions — so SQL resolution must work with no imperative
    // registration call in this test
    val r = spark.sql("SELECT cosine_sim(array(3.0D, 4.0D), array(3.0D, 4.0D)) AS c, hamming64(5, 6) AS h").first()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getInt(1) == 2) // 101 xor 110 = 011
  }

  test("cosine_sim rejects non-double arrays at analysis time with an actionable message") {
    GraftFunctions.registerAll(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      // float arrays (the raw embeddings type) must be cast explicitly
      spark.read.parquet(s"$sf/embeddings.parquet")
        .selectExpr("cosine_sim(embedding, embedding)")
        .collect()
    }
    assert(e.getMessage.contains("array<double>"), s"unhelpful message: ${e.getMessage}")
  }

  test("cosine_sim null propagation") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql("SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D, 2.0D)) AS c")
      .first()
    assert(r.isNullAt(0))
  }

  test("pq_encode / pq_adc equal the higher-order-function composition bit-for-bit") {
    GraftFunctions.registerAll(spark)
    val unit = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .selectExpr("vec_id", "transform(v, x -> x / sqrt(aggregate(v, 0D, (a, x) -> a + x*x))) AS u")
    import org.apache.spark.sql.functions.col
    val both = unit
      .withColumn("native", org.apache.spark.sql.functions.expr("pq_encode(u)"))
      .withColumn("hof", graft.dedup.Embed.pqCodesHof(col("u")))
      .withColumn("adc_native", org.apache.spark.sql.functions.expr("pq_adc(u, native)"))
      .withColumn("adc_hof", graft.dedup.Embed.adcDistHof(col("u"), col("hof")))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Int](r.fieldIndex("native")) == r.getSeq[Int](r.fieldIndex("hof")),
        s"codes diverge for vec ${r.get(0)}")
      // bit-identical, not approximately equal — same fold order
      assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("adc_native")) ==
        java.lang.Double.doubleToLongBits(r.getAs[Double]("adc_hof")),
        s"adc diverges for vec ${r.get(0)}")
    }
  }

  test("ivf_assign equals the higher-order-function composition exactly") {
    GraftFunctions.registerAll(spark)
    import org.apache.spark.sql.functions.col
    val both = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .selectExpr("vec_id", "transform(v, x -> x / sqrt(aggregate(v, 0D, (a, x) -> a + x*x))) AS u")
      .withColumn("native", org.apache.spark.sql.functions.expr("ivf_assign(u)"))
      .withColumn("hof", graft.dedup.Dedup.ivfAssignHof(col("u")))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getAs[Int]("native") == r.getAs[Int]("hof"),
        s"assignment diverges for vec ${r.get(0)}")
    }
  }

  test("cosine_sim zero vector is NaN (documented); nanvl is the sentinel recipe") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT cosine_sim(array(0.0D, 0.0D), array(1.0D, 2.0D)) AS c,
        |       nanvl(cosine_sim(array(0.0D, 0.0D), array(1.0D, 2.0D)), 0.0D) AS c0""".stripMargin)
      .first()
    assert(r.getDouble(0).isNaN)
    assert(r.getDouble(1) == 0.0)
  }
}
