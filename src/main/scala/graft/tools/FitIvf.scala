package graft.tools

import org.apache.spark.sql.functions._

/** Offline trainer for the IVF coarse-quantizer centroids
  * ([[graft.dedup.IvfCentroids]]): full-dimension Lloyd k-means
  * (fixed seed/init/iteration count, shared with [[FitPq]]) over the
  * UNIT-normalized sf0.01 embeddings, printed as Scala source.
  *
  * Like the PQ codebook, the coarse quantizer is a model ARTIFACT,
  * not query-time state — production trains it once per corpus
  * generation on a sample and ships it with the job. Committing the
  * fitted literals lets BOTH engines — the Spark plan and the DuckDB
  * oracle — embed identical centroid bits, which is what turns
  * `sim_ann_ivf` from a rows-only check into a hash-matched oracle
  * query (assignment, probe selection and scoring all replay).
  *
  * Regenerate with:
  * {{{
  * sbt 'runMain graft.tools.FitIvf /root/testdata/sf0.01'
  * }}}
  * and paste the output over IvfCentroids.scala.
  */
object FitIvf {
  val K = 16 // coarse cells (matches the registered sim_ann_ivf dial)
  val D = 64 // embedding dimension

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.get()
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .select(col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", expr("sqrt(aggregate(v, 0D, (a, x) -> a + x*x))"))
      .filter(col("nrm") > 0)
      .withColumn("u", expr("transform(v, x -> x / nrm)"))
      .select("u").collect().map(_.getSeq[Double](0).toArray)
    require(vecs.forall(_.length == D), s"expected $D-dim embeddings")

    val cents = FitPq.kmeans(vecs, K, iters = 25, seed = 42L)

    val sb = new StringBuilder
    sb ++= "package graft.dedup\n\n"
    sb ++= "/** FITTED IVF coarse-quantizer centroids — a committed model\n"
    sb ++= "  * artifact (see [[graft.tools.FitIvf]] for the trainer and the\n"
    sb ++= s"  * regeneration command). k=$K full-dimension (d=$D) centroids\n"
    sb ++= "  * over unit-normalized embeddings. DO NOT hand-edit. */\n"
    sb ++= "object IvfCentroids {\n"
    sb ++= s"  val K = $K; val D = $D\n"
    sb ++= "  val centroids: IndexedSeq[IndexedSeq[Double]] = Vector(\n"
    cents.zipWithIndex.foreach { case (c, i) =>
      sb ++= "    Vector( // centroid " + i + "\n      "
      sb ++= c.map(FitPq.formatD).grouped(4)
        .map(_.mkString(", ")).mkString(",\n      ")
      sb ++= "),\n"
    }
    sb.setLength(sb.length - 2); sb ++= ")\n}\n"
    println(sb.result())
    spark.stop()
  }
}
