package graft

import graft.queries.Relational

class RelationalSpec extends SparkSpec {

  test("every relational query runs, has rows, and a matching oracle") {
    Relational.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
      assert(Relational.oracles.contains(name), s"$name missing oracle SQL")
    }
  }

  test("q1_agg aggregates every lineitem exactly once") {
    val rows = Relational.q1Agg(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter("l_shipdate <= timestamp'2000-12-01'").count()
    assert(total == expected)
    assert(rows.length == 6) // 3 returnflags x 2 linestatus
  }

  test("q_topk_group emits at most 3 rows per brand, ranked") {
    val rows = Relational.qTopkGroup(spark, sf).collect()
    val byBrand = rows.groupBy(_.getAs[String]("p_brand"))
    byBrand.values.foreach { rs =>
      assert(rs.length <= 3)
      val prices = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("p_retailprice"))
      assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q_sessionize: session counts sum to event count") {
    val n = Relational.qSessionize(spark, sf).agg(org.apache.spark.sql.functions.sum("n_events"))
      .collect()(0).getLong(0)
    assert(n == spark.read.parquet(s"$sf/events.parquet").count())
  }

  test("q_cube: grouping sets are mutually consistent") {
    val rows = Relational.qCube(spark, sf).collect()
    def tot(gid: Int) = rows.filter(_.getAs[Int]("gid") == gid)
      .map(_.getAs[Long]("n_orders")).sum
    val grand = tot(3)
    assert(grand == spark.read.parquet(s"$sf/orders.parquet").count())
    // every partial grouping set re-partitions the same universe
    assert(tot(0) == grand && tot(1) == grand && tot(2) == grand)
    val gidOf = rows.map(r => (r.getAs[String]("priority"), r.getAs[String]("status")) ->
      r.getAs[Int]("gid")).toMap
    assert(gidOf(("ALL", "ALL")) == 3)
    rows.foreach { r =>
      val expect = (if (r.getAs[String]("priority") == "ALL") 2 else 0) +
        (if (r.getAs[String]("status") == "ALL") 1 else 0)
      assert(r.getAs[Int]("gid") == expect)
    }
  }

  test("q_grouping_sets: exactly the two marginals, each covering all orders") {
    val rows = Relational.qGroupingSets(spark, sf).collect()
    val nOrders = spark.read.parquet(s"$sf/orders.parquet").count()
    // priority marginal (gid 1: status is ALL), status marginal (gid 2)
    val byGid = rows.groupBy(_.getAs[Int]("gid"))
    assert(byGid.keySet == Set(1, 2), s"unexpected gids: ${byGid.keySet}")
    assert(byGid(1).forall(_.getAs[String]("status") == "ALL"))
    assert(byGid(2).forall(_.getAs[String]("priority") == "ALL"))
    assert(byGid(1).map(_.getAs[Long]("n_orders")).sum == nOrders)
    assert(byGid(2).map(_.getAs[Long]("n_orders")).sum == nOrders)
    // no grand total, no full cross — sets rollup/cube can't express
    assert(!rows.exists(r =>
      r.getAs[String]("priority") == "ALL" && r.getAs[String]("status") == "ALL"))
    assert(!rows.exists(r =>
      r.getAs[String]("priority") != "ALL" && r.getAs[String]("status") != "ALL"))
  }

  test("q_semi_anti: semi + full-anti partitions customers") {
    val rows = Relational.qSemiAnti(spark, sf).collect()
    val kinds = rows.groupBy(_.getAs[String]("kind")).view.mapValues(_.length).toMap
    assert(kinds.getOrElse("has_order", 0) > 0)
  }
}
