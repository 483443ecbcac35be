package graft

import org.apache.spark.sql.functions._
import graft.er.ER
import graft.kg.{Graphs, Triples}

class ERSpec extends SparkSpec {

  test("every er query runs, has rows, and a matching oracle") {
    ER.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
      assert(ER.oracles.contains(name), s"$name missing oracle SQL")
    }
  }

  test("connected components agree with an in-test union-find") {
    val edges = ER.erFuzzyMatch(spark, sf).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ids = spark.read.parquet(s"$sf/part.parquet").select("p_partkey")
      .collect().map(_.getLong(0))
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = ids.map(i => i -> find(i)).toMap
    // path-compress fully
    val expected2 = expected.map { case (k, _) => k -> find(k) }
    val got = ER.erConnectedComponents(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected2)
  }

  test("fuzzy match includes all exact dup pairs") {
    val exact = ER.erExactDups(spark, sf).count()
    val zeroDist = ER.erFuzzyMatch(spark, sf).filter(col("dist") === 0).count()
    assert(exact == 0 || zeroDist > 0)
  }

  test("linking picks the mention's own noun when present (score 0 impossible beats)") {
    val linked = ER.erLinking(spark, sf)
    // every part links to exactly one concept
    assert(linked.groupBy("id").count().filter(col("count") =!= 1).count() == 0)
  }

  test("graphx degrees/pagerank run over statements") {
    val st = Triples.statements(spark, sf)
    assert(Graphs.degrees(spark, st).count() > 0)
    assert(Graphs.pageRank(spark, st, 0.01).count() > 0)
  }
}
