package graft.tools

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import graft.kg.Sparql

/** Parse census over a DIRECTORY of .rq files — how much of a real
  * query corpus the compiler's text surface accepts structurally, and
  * the exact reject reason for the rest (always a loud, specific
  * message — never a silently wrong plan). Usage:
  *
  *   sbt 'runMain graft.tools.RqCensus <dir-with-rq-files>'
  *
  * Parse-level only (dialect maps bind at compile time): a PARSE line
  * means the file's structure — BGPs, OPTIONAL/UNION groups, paths,
  * label service, MINUS/NOT EXISTS, VALUES, BINDs, aggregates — is
  * fully recognized, and running it is a matter of supplying the
  * deployment's predicate/entity alias maps. REJECT lines fall into
  * the documented out-of-scope classes (endpoint federation,
  * branch-scoped keyword groups, expression BINDs beyond the
  * IRI-CONCAT form).
  */
object RqCensus {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get(args.headOption.getOrElse(
      throw new IllegalArgumentException("usage: RqCensus <dir-with-rq-files>")))
    val files = Files.list(dir).iterator().asScala.toList
      .filter(_.getFileName.toString.endsWith(".rq")).sortBy(_.getFileName.toString)
    require(files.nonEmpty, s"no .rq files under $dir")
    var ok = 0
    val results = files.map { f: Path =>
      val text = new String(Files.readAllBytes(f), "UTF-8")
      val name = f.getFileName.toString
      try {
        val q = Sparql.parse(text)
        ok += 1
        val bits = Seq(
          if (q.patterns.nonEmpty) Some(s"${q.patterns.size} patterns") else None,
          if (q.optionals.nonEmpty) Some(s"${q.optionals.size} optional") else None,
          if (q.unions.nonEmpty) Some(s"${q.unions.map(_.size).sum} union branches") else None,
          if (q.minuses.nonEmpty) Some(s"${q.minuses.size} minus/not-exists") else None,
          if (q.values.nonEmpty) Some(s"${q.values.size} values") else None,
          if (q.binds.nonEmpty || q.iriBinds.nonEmpty)
            Some(s"${q.binds.size + q.iriBinds.size} binds") else None,
          q.labelLangs.map(l => s"label[${l.mkString(",")}]"),
          if (q.services.nonEmpty)
            Some(s"${q.services.size} service[${q.services.map(_.endpoint.replaceAll("https?://|/sparql$", "")).mkString(",")}]") else None,
          if (q.ifBinds.nonEmpty) Some(s"${q.ifBinds.size} if-binds") else None,
          if (q.aggs.nonEmpty) Some(s"${q.aggs.size} aggs") else None
        ).flatten.mkString(", ")
        f"$name%-55s PARSE   $bits"
      } catch {
        case e: Exception =>
          f"$name%-55s reject  ${e.getMessage.linesIterator.next().take(100)}"
      }
    }
    results.foreach(println)
    println(f"%n$ok/${files.size} files parse structurally")
  }
}
