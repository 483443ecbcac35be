package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.kg.{Mapping, Rdf, Sparql, Triples}
import graft.sources.{Ingest, Tables}

/** The end-to-end user story in ONE command (round-12 directive #8) —
  * what a reference user does across their R scripts, on this engine:
  *
  *   1. raw CSVs arrive (simulated here by exporting three sf0.001
  *      tables to CSV — the "your data" stand-in);
  *   2. ingest CSV → typed parquet workspace (`sources.Ingest`);
  *   3. declare the graph as a Mapping.yml document (RML-lite) and
  *      build the statements frame from it (`kg.Mapping` +
  *      `Triples.mapped` — config, not code);
  *   4. run SPARQL TEXT against those statements (`Sparql.runOn`);
  *   5. export the graph as N-Triples to a file
  *      (`Rdf.renderNt` → `Ingest.writeText`);
  *   6. re-import the file (`Rdf.kgImportNtFile`) and prove the round
  *      trip is lossless (multiset checksum).
  *
  * Usage: sbt 'runMain graft.tools.Quickstart'   (~30 s, local[8])
  */
object Quickstart {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(master = "local[8]", shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = args.headOption.getOrElse("/root/testdata/sf0.001")
    val work = "/tmp/graft_quickstart"
    def rmRf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmRf)
      f.delete(); ()
    }
    rmRf(new java.io.File(work))

    // -- 1. "your data": three CSV files --------------------------------
    Ingest.writeCsv(Tables.region(spark, src), s"$work/csv/region")
    Ingest.writeCsv(Tables.nation(spark, src), s"$work/csv/nation")
    Ingest.writeCsv(Tables.customer(spark, src)
      .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment"), s"$work/csv/customer")
    println(s"1. raw CSVs under $work/csv")

    // -- 2. CSV → typed parquet workspace --------------------------------
    Ingest.writeParquet(Ingest.csv(spark, s"$work/csv/region",
      "r_regionkey BIGINT, r_name STRING"), s"$work/tables/region.parquet")
    Ingest.writeParquet(Ingest.csv(spark, s"$work/csv/nation",
      "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT"), s"$work/tables/nation.parquet")
    Ingest.writeParquet(Ingest.csv(spark, s"$work/csv/customer",
      "c_custkey BIGINT, c_name STRING, c_nationkey BIGINT, c_mktsegment STRING"),
      s"$work/tables/customer.parquet")
    println(s"2. typed parquet workspace under $work/tables")

    // -- 3. mapping config → statements ----------------------------------
    val mappingYml =
      """namespaces:
        |  region: 1
        |  nation: 2
        |  customer: 3
        |mappings:
        |  - table: region
        |    s: r_regionkey
        |    ns: region
        |    po:
        |      - {p: label, o: r_name}
        |  - table: nation
        |    s: n_nationkey
        |    ns: nation
        |    po:
        |      - {p: in_region, o: n_regionkey, ns: region}
        |      - {p: label, o: n_name}
        |  - table: customer
        |    s: c_custkey
        |    ns: customer
        |    po:
        |      - {p: in_nation, o: c_nationkey, ns: nation}
        |      - {p: label, o: c_name}
        |      - {p: mktsegment, o: c_mktsegment}
        |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$work/mapping.yml"), mappingYml)
    val rules = Mapping.load(s"$work/mapping.yml")
    val statements = Triples.mapped(spark, s"$work/tables", rules)
    println(s"3. mapping.yml → ${rules.size} rules → ${statements.count()} statements")

    // -- 4. SPARQL text over the mapped graph -----------------------------
    val rq =
      """PREFIX fgt: <https://database.factgrid.de/prop/direct/>
        |SELECT ?rl (COUNT(?c) AS ?members) WHERE {
        |  ?c fgt:P2/fgt:P3 ?r .
        |  ?r label ?rl .
        |} GROUP BY ?rl ORDER BY ?rl""".stripMargin
    val byRegion = Sparql.runOn(spark, statements, rq,
      predAliases = Map("fgt:P2" -> "in_nation", "fgt:P3" -> "in_region"))
    println("4. SPARQL: customers per region")
    byRegion.show(10, truncate = false)

    // -- 5. export N-Triples ----------------------------------------------
    val ntPath = s"$work/export.nt"
    Ingest.writeText(Rdf.renderNt(statements), ntPath)
    println(s"5. exported ${spark.read.text(ntPath).count()} N-Triples lines to $ntPath")

    // -- 6. re-import, prove losslessness ---------------------------------
    val back = Rdf.kgImportNtFile(spark, ntPath)
    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), bit_xor(xxhash64(col("s"), col("p"),
        coalesce(col("o_id"), lit(-1L)), coalesce(col("o_val"), lit("<null>")),
        coalesce(col("lang"), lit("<null>"))))).head()
      (r.getLong(0), r.getLong(1))
    }
    val (n0, h0) = checksum(statements.select("s", "p", "o_id", "o_val", "lang"))
    val (n1, h1) = checksum(back.select("s", "p", "o_id", "o_val", "lang"))
    require(n0 == n1 && h0 == h1,
      s"round trip NOT lossless: export ($n0, $h0) vs re-import ($n1, $h1)")
    println(s"6. re-import round trip lossless: $n1 statements, multiset checksum match")
    println("QUICKSTART OK")
    spark.stop()
  }
}
