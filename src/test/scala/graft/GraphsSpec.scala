package graft

import org.apache.spark.sql.functions._

import graft.kg.{Graphs, TripleStore, Triples}

/** Pregel transitive closure: result-identical to the DataFrame
  * fixpoint, and the measured crossover between the two engines —
  * deep skinny chains favor Pregel's cheap supersteps, the shallow
  * bushy test KG favors the fixpoint (documented in Graphs.closure's
  * scaladoc and SURVEY §5). */
class GraphsSpec extends SparkSpec {

  test("Pregel closure matches the DataFrame fixpoint on the test graph") {
    val store = TripleStore(spark, Triples.statements(spark, sf))
    val edges = store.statements
      .filter(col("p").isin("in_nation", "in_region"))
      .select(col("s").as("a"), col("o_id").as("b"))
    val pregel = Graphs.closure(spark, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixpoint = store.closure(Seq("in_nation", "in_region"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pregel == fixpoint)
    assert(pregel.nonEmpty)
  }

  test("deep-chain closure: Pregel and fixpoint agree; crossover measured") {
    // a depth-64 chain is the adversarial case for the per-round
    // fixpoint (64 join+checkpoint rounds for 64 supersteps)
    val sess = spark; import sess.implicits._
    val depth = 64
    val chain = (0 until depth).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val (pregel, tp) = timed {
      Graphs.closure(spark, chain)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val (fix, tf) = timed {
      val r = TripleStore.closureOf(chain)
      val s = r.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      graft.util.Checkpoints.freeAll(r)
      s
    }
    info(f"depth-$depth chain: pregel $tp%.1f s, fixpoint $tf%.1f s")
    assert(pregel == fix)
    // expected closure of a chain: all (i, j) with i < j <= depth
    assert(pregel.size == (depth + 1) * depth / 2)
  }
}
