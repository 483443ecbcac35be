package graft.tools

import org.apache.spark.sql.functions._

/** Offline trainer for the product-quantization codebook
  * ([[graft.dedup.PqCodebook]]): per-subspace k-means (Lloyd, fixed
  * seed/init/iteration count) over the UNIT-normalized sf0.01
  * embeddings, printed as Scala source.
  *
  * PQ codebooks are model ARTIFACTS, not query-time state — a
  * production pipeline trains them once per corpus generation on a
  * sample (exactly like the IVF coarse quantizer, Dedup.annIvf) and
  * ships the artifact with the job. Committing the fitted literals is
  * what lets BOTH engines — the Spark plan and the DuckDB oracle —
  * embed the identical codebook and hash-match the whole ANN pipeline
  * end-to-end.
  *
  * Regenerate with:
  * {{{
  * sbt 'runMain graft.tools.FitPq /root/testdata/sf0.01'
  * }}}
  * and paste the output over PqCodebook.scala.
  */
object FitPq {
  val M = 16 // subspaces
  val DSub = 4 // dims per subspace (d = 64)
  val K = 16 // codewords per subspace (4-bit codes)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.get()
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .select(col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", expr("sqrt(aggregate(v, 0D, (a, x) -> a + x*x))"))
      .filter(col("nrm") > 0)
      .withColumn("u", expr("transform(v, x -> x / nrm)"))
      .select("u").collect().map(_.getSeq[Double](0).toArray)

    val cb = (0 until M).map { j =>
      val sub = vecs.map(_.slice(j * DSub, (j + 1) * DSub))
      kmeans(sub, K, iters = 25, seed = 42 + j)
    }

    val sb = new StringBuilder
    sb ++= "package graft.dedup\n\n"
    sb ++= "/** FITTED product-quantization codebook — a committed model\n"
    sb ++= "  * artifact (see [[graft.tools.FitPq]] for the trainer and the\n"
    sb ++= "  * regeneration command). m=16 subspaces x 16 codewords x 4 dims\n"
    sb ++= "  * over unit-normalized embeddings. DO NOT hand-edit. */\n"
    sb ++= "object PqCodebook {\n"
    sb ++= "  val M = 16; val DSub = 4; val K = 16\n"
    sb ++= "  val codebook: IndexedSeq[IndexedSeq[IndexedSeq[Double]]] = Vector(\n"
    cb.zipWithIndex.foreach { case (cw, j) =>
      sb ++= "    Vector( // subspace " + j + "\n"
      cw.foreach { c =>
        sb ++= "      Vector(" + c.map(formatD).mkString(", ") + "),\n"
      }
      sb.setLength(sb.length - 2); sb ++= "),\n"
    }
    sb.setLength(sb.length - 2); sb ++= ")\n}\n"
    println(sb.result())
    spark.stop()
  }

  /** Render a double so it round-trips exactly (java toString does). */
  private[graft] def formatD(d: Double): String = {
    val s = d.toString
    require(java.lang.Double.parseDouble(s) == d)
    s
  }

  /** Plain Lloyd k-means with deterministic seeding (first k points of
    * a seeded shuffle) — small data, driver-side; production would use
    * MLlib on a sample exactly like annIvf's coarse quantizer. */
  private[graft] def kmeans(xs: Array[Array[Double]], k: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    var centers = rnd.shuffle(xs.toVector).take(k).map(_.clone).toArray
    for (_ <- 0 until iters) {
      val assign = xs.map { x => (bestCenter(x, centers), x) }
      centers = (0 until k).map { c =>
        val mine = assign.filter(_._1 == c).map(_._2)
        if (mine.isEmpty) centers(c)
        else {
          val s = new Array[Double](mine.head.length)
          mine.foreach(x => for (i <- s.indices) s(i) += x(i))
          s.map(_ / mine.length)
        }
      }.toArray
    }
    centers
  }

  private[graft] def bestCenter(x: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0; var bd = Double.MaxValue
    for (c <- cs.indices) {
      var d = 0.0
      for (i <- x.indices) { val t = x(i) - cs(c)(i); d += t * t }
      if (d < bd) { bd = d; best = c }
    }
    best
  }
}
