package graft.tools

import org.apache.spark.sql.functions._

import graft.kg.{TripleStore, Triples}

/** Sample code through the TripleStore DSL + extension-injected SQL
  * functions (no imperative registerAll — GraftSession wires
  * GraftExtensions). Usage: sbt 'runMain graft.tools.KGDemo'
  */
object KGDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(master = "local[8]", shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val store = TripleStore(spark, "/root/testdata/sf0.01")

    val hops = store.khop(store.byLabel("ASIA")
        .filter(store.inNamespace(col("node"), Triples.REGION)), k = 2)
      .groupBy("dist").count().orderBy("dist").collect()
    println("khop dist counts: " + hops.map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(" "))

    val closure = store.closure(Seq("in_nation", "in_region")).count()
    println(s"closure pairs: $closure")

    // extension-injected function straight from SQL, no registerAll
    val c = spark.sql(
      "SELECT cosine_sim(array(1.0D, 2.0D, 3.0D), array(1.0D, 2.0D, 3.0D)) AS c").first().getDouble(0)
    println(s"cosine_sim via extensions: $c")

    val empty = store.khop(store.byLabel("NO_SUCH_LABEL"), k = 2).count()
    println(s"khop from empty seeds: $empty rows")
    spark.stop()
  }
}
