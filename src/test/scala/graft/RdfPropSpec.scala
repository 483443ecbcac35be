package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.kg.{Rdf, Triples}

/** Seeded-random round-trip property for the N-Triples serialization:
  * for ANY statements frame (within the documented character
  * constraints), `parseNt(renderNt(st)) == st`. The generator mixes
  * the three object kinds and stuffs literals with the characters the
  * escaper must handle (backslash runs, quotes, newlines, tabs, CR,
  * non-ASCII). Excluded by documented design: U+0001 (the unescape
  * sentinel) and the non-\n line separators Java regex `.` refuses
  * (U+0085, U+2028, U+2029) — a crawl corpus normalizes these before
  * serialization. */
class RdfPropSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("s", LongType, nullable = false),
    StructField("p", StringType, nullable = false),
    StructField("o_id", LongType, nullable = true),
    StructField("o_val", StringType, nullable = true),
    StructField("lang", StringType, nullable = true)))

  test("parseNt(renderNt(statements)) is the identity on 400 random statements") {
    val rnd = new scala.util.Random(42)
    val nastyChars = "ab cz09\\\"\n\r\t德é'#<>&%|@:{}[]()$^*+?.~`"
    def randLit(): String =
      (0 until rnd.nextInt(24)).map(_ => nastyChars(rnd.nextInt(nastyChars.length))).mkString
    val preds = Vector("label", "brand", "type", "status", "in_region")
    val rows = (0 until 400).map { i =>
      val s = (rnd.nextInt(6) + 1).toLong * Triples.NS + rnd.nextInt(1000000)
      rnd.nextInt(3) match {
        case 0 => // entity object
          val o = (rnd.nextInt(6) + 1).toLong * Triples.NS + rnd.nextInt(1000000)
          Row(s, preds(rnd.nextInt(preds.length)), o, null, null)
        case 1 => // language-tagged literal
          Row(s, "label", null, randLit(), if (rnd.nextBoolean()) "en" else "de")
        case _ => // plain literal
          Row(s, preds(rnd.nextInt(preds.length)), null, randLit(), null)
      }
    }
    val st = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val back = Rdf.parseNt(Rdf.renderNt(st))
    val missing = st.exceptAll(back).count()
    val extra = back.exceptAll(st).count()
    assert(missing == 0 && extra == 0,
      s"round trip lost $missing rows and invented $extra")
    assert(back.count() == 400)
  }
}
