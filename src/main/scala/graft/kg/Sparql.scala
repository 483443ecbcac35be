package graft.kg

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Triples.{sqlCte => T}

/** A SPARQL-subset compiler: parse the query text a reference user
  * already has in `.rq` files and compile it to the same DataFrame
  * plans the hand-built queries use — the "run your existing queries"
  * surface. Covers the constructs the reference's query files
  * actually exercise (the .rq files under data-publishing/factgrid/
  * queries): basic
  * graph patterns, literal objects, OPTIONAL single patterns,
  * FILTER(REGEX(?v, "...")) and FILTER(?v = "..."), ORDER BY, LIMIT.
  * PREFIX declarations and comments are accepted and ignored
  * (predicates here are the store's local names).
  *
  * Typing rule — SCHEMA-driven, the `wikibase:propertyType` idea:
  * subjects always bind `s` (long); an object variable binds `o_id`
  * (long) iff its pattern's predicate is entity-valued in the store's
  * mapping dictionary ([[Triples.rules]]), else `o_val` (string).
  * A variable bound both ways across patterns is a type conflict and
  * fails loudly, as does any unsupported syntax — never a silently
  * dropped pattern.
  *
  * Compilation is PLAN-NATIVE, not interpretive: each triple pattern
  * becomes a predicate-pruned scan of the statements relation, shared
  * variables become equi-join keys (shuffle on the variable — exactly
  * the hand-written BGP shape Catalyst already optimizes), OPTIONAL
  * becomes a left outer join, FILTERs push onto their pattern columns.
  * A query arriving as text therefore costs the same as one written
  * against the DSL. */
object Sparql {

  sealed trait Term
  final case class V(name: String) extends Term
  final case class Lit(value: String) extends Term
  final case class Num(value: Long) extends Term

  final case class Pattern(s: Term, p: String, o: Term, optional: Boolean)
  sealed trait Filt
  final case class FRegex(v: String, re: String) extends Filt
  final case class FEq(v: String, value: String) extends Filt

  final case class Query(
      select: Seq[String], patterns: Seq[Pattern], filters: Seq[Filt],
      orderBy: Seq[String], limit: Option[Int])

  // ---- parser --------------------------------------------------------

  private val SelectRe = """(?is).*?SELECT\s+((?:\?\w+\s*)+)\s*WHERE\s*\{(.*)\}\s*(ORDER\s+BY\s+((?:\?\w+\s*)+))?\s*(LIMIT\s+(\d+))?\s*""".r
  private val OptionalRe = """(?is)OPTIONAL\s*\{([^}]*)\}""".r
  // filter body: non-paren runs or ONE nested level (REGEX(...)-deep)
  private val FilterRe = """(?is)FILTER\s*\(\s*((?:[^()]|\([^()]*\))*)\s*\)\s*\.?""".r
  private val RegexRe = """(?is)REGEX\s*\(\s*\?(\w+)\s*,\s*"([^"]*)"\s*\)""".r
  private val EqRe = """(?is)\?(\w+)\s*=\s*"([^"]*)"""".r

  private def term(tok: String): Term = tok.trim match {
    case t if t.startsWith("?")                      => V(t.drop(1))
    case t if t.startsWith("\"") && t.endsWith("\"") => Lit(t.drop(1).dropRight(1))
    case t if t.matches("-?\\d+")                    => Num(t.toLong)
    case t => throw new IllegalArgumentException(s"unsupported term: '$t'")
  }

  private def triples(body: String, optional: Boolean): Seq[Pattern] =
    body.split("\\.").map(_.trim).filter(_.nonEmpty).map { stmt =>
      // a triple is three whitespace-separated tokens, quotes may hold spaces
      val toks = ("\"[^\"]*\"|\\S+".r).findAllIn(stmt).toList
      require(toks.length == 3, s"unsupported pattern (need 's p o .'): '$stmt'")
      Pattern(term(toks(0)), toks(1), term(toks(2)), optional)
    }.toSeq

  /** Parse the supported SPARQL subset; throws with the offending
    * fragment on anything outside it. */
  def parse(q0: String): Query = {
    // strip comments and PREFIX lines
    val q = q0.linesIterator
      .map(l => l.indexOf('#') match { case -1 => l; case i => l.take(i) })
      .filterNot(_.trim.toUpperCase.startsWith("PREFIX"))
      .mkString("\n")
    q match {
      case SelectRe(vars, body0, _, order, _, limit) =>
        var body = body0
        val opts = OptionalRe.findAllMatchIn(body).toList
          .flatMap(m => triples(m.group(1), optional = true))
        body = OptionalRe.replaceAllIn(body, " ")
        val filts = FilterRe.findAllMatchIn(body).toList.map { m =>
          m.group(1).trim match {
            case RegexRe(v, re)  => FRegex(v, re)
            case EqRe(v, value)  => FEq(v, value)
            case other => throw new IllegalArgumentException(s"unsupported FILTER: '$other'")
          }
        }
        body = FilterRe.replaceAllIn(body, " ")
        val pats = triples(body, optional = false) ++ opts
        require(pats.nonEmpty, "empty graph pattern")
        Query(
          select = vars.trim.split("\\s+").map(_.stripPrefix("?")).toSeq,
          patterns = pats,
          filters = filts,
          orderBy = Option(order).map(_.trim.split("\\s+").map(_.stripPrefix("?")).toSeq)
            .getOrElse(Seq.empty),
          limit = Option(limit).map(_.toInt))
      case _ => throw new IllegalArgumentException("unsupported query shape (need SELECT ... WHERE {...})")
    }
  }

  // ---- compiler ------------------------------------------------------

  /** Compile a parsed query against the statement store. */
  /** Predicates whose objects are entities, per the store's mapping
    * dictionary — the typing source (see object doc). */
  private lazy val entityPreds: Set[String] =
    Triples.rules.collect { case r if r.oNs.isDefined => r.p }.toSet

  def compile(spark: SparkSession, dir: String, q: Query): DataFrame = {
    val st = Triples.statements(spark, dir)
    // type-conflict check: every binding site of a var must agree
    val varKinds = q.patterns.flatMap { p =>
      (p.s match { case V(n) => Seq(n -> "entity"); case _ => Nil }) ++
        (p.o match {
          case V(n) => Seq(n -> (if (entityPreds(p.p)) "entity" else "literal"))
          case _ => Nil
        })
    }
    varKinds.groupBy(_._1).foreach { case (v, kinds) =>
      require(kinds.map(_._2).distinct.size == 1,
        s"type conflict: ?$v bound as both entity and literal across patterns")
    }

    def frame(p: Pattern): DataFrame = {
      var df = st.filter(col("p") === p.p)
      val cols = scala.collection.mutable.ListBuffer[Column]()
      p.s match {
        case V(n)   => cols += col("s").as(n)
        case Num(v) => df = df.filter(col("s") === v)
        case Lit(v) => throw new IllegalArgumentException(s"literal subject '$v' unsupported")
      }
      p.o match {
        case V(n) if entityPreds(p.p) =>
          df = df.filter(col("o_id").isNotNull); cols += col("o_id").as(n)
        case V(n)   => df = df.filter(col("o_val").isNotNull); cols += col("o_val").as(n)
        case Num(v) => df = df.filter(col("o_id") === v)
        case Lit(v) => df = df.filter(col("o_val") === v)
      }
      require(cols.nonEmpty, s"pattern binds no variables: $p")
      df.select(cols.toSeq: _*)
    }

    val (required, optional) = q.patterns.partition(!_.optional)
    require(required.nonEmpty, "OPTIONAL-only patterns unsupported")
    def joinKeys(a: DataFrame, b: DataFrame): Seq[String] =
      a.columns.toSeq.intersect(b.columns.toSeq)
    var acc = frame(required.head)
    required.tail.foreach { p =>
      val f = frame(p)
      val keys = joinKeys(acc, f)
      require(keys.nonEmpty, s"pattern not connected to the rest of the BGP: $p")
      acc = acc.join(f, keys)
    }
    optional.foreach { p =>
      val f = frame(p)
      val keys = joinKeys(acc, f)
      require(keys.nonEmpty, s"OPTIONAL pattern not connected: $p")
      acc = acc.join(f, keys, "left_outer")
    }
    q.filters.foreach {
      case FRegex(v, re) => acc = acc.filter(col(v).rlike(re))
      case FEq(v, value) => acc = acc.filter(col(v) === value)
    }
    if (q.orderBy.nonEmpty) acc = acc.orderBy(q.orderBy.map(col): _*)
    q.limit.foreach(n => acc = acc.limit(n))
    acc.select(q.select.map(col): _*)
  }

  def run(spark: SparkSession, dir: String, queryText: String): DataFrame =
    compile(spark, dir, parse(queryText))

  // ---- registry ------------------------------------------------------

  /** The flagship text query (the companions/label shape of the
    * reference's .rq files): BUILDING customers with their nation and
    * its label, OPTIONAL (possibly multiple) customer labels, NATION_1x only. */
  val flagship: String =
    """PREFIX g: <http://graft.local/>   # accepted and ignored
      |SELECT ?c ?n ?nname ?cname WHERE {
      |  ?c in_nation ?n .
      |  ?n label ?nname .
      |  ?c mktsegment "BUILDING" .
      |  OPTIONAL { ?c label ?cname . }
      |  FILTER(REGEX(?nname, "^NATION_1"))
      |}""".stripMargin

  /** kg_sparql — [[flagship]] parsed from TEXT and compiled; the
    * oracle is the hand-written SQL of the same query, so the parser
    * and compiler are themselves under the hash gate. */
  def kgSparql(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, flagship)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kg_sparql" -> (kgSparql _))

  val oracles: Map[String, String] = Map(
    "kg_sparql" ->
      s"""$T
         |SELECT cn.s AS c, cn.o_id AS n, nl.o_val AS nname, cl.o_val AS cname
         |FROM (SELECT s, o_id FROM triples WHERE p = 'in_nation') cn
         |JOIN (SELECT s, o_val FROM triples WHERE p = 'label' AND o_val IS NOT NULL) nl
         |  ON nl.s = cn.o_id
         |JOIN (SELECT s FROM triples WHERE p = 'mktsegment' AND o_val = 'BUILDING') seg
         |  ON seg.s = cn.s
         |LEFT JOIN (SELECT s, o_val FROM triples WHERE p = 'label' AND o_val IS NOT NULL) cl
         |  ON cl.s = cn.s
         |WHERE regexp_matches(nl.o_val, '^NATION_1')""".stripMargin)
}
