package graft

import org.apache.spark.sql.functions._
import graft.kg.{KGQueries, TripleStore, Triples}

class TripleStoreSpec extends SparkSpec {

  private lazy val store = TripleStore(spark, sf)

  test("khop DSL matches the fixed kg_khop query") {
    val dsl = store.khop(store.byLabel("ASIA")
        .filter(store.inNamespace(col("node"), Triples.REGION)), k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val fixed = KGQueries.kgKhop(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(dsl == fixed)
  }

  test("closure DSL matches the fixed kg_property_path query") {
    val dsl = store.closure(Seq("in_nation", "in_region"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixed = KGQueries.kgPropertyPath(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dsl == fixed)
  }

  test("label service resolves every placed_by customer") {
    val placed = store.pattern("placed_by").select(col("o_id"))
    val resolved = store.labeled(placed, "o_id")
    assert(resolved.count() == placed.count())
    assert(resolved.filter(col("label").isNull).count() == 0)
  }

  test("diff classifies an identical copy as all match") {
    val d = store.diff(store.pattern("mktsegment").select(col("s"), col("o_val")), "mktsegment")
    assert(d.filter(col("status") =!= "match").count() == 0)
  }
}
