package graft.kg

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Triples.{sqlCte => T}

/** A SPARQL-subset compiler: parse the query text a reference user
  * already has in `.rq` files and compile it to the same DataFrame
  * plans the hand-built queries use — the "run your existing queries"
  * surface. Covers the constructs the reference's query files
  * actually exercise (the .rq files under data-publishing/factgrid/
  * queries — lokale-from-factgrid.rq is the shape target): basic
  * graph patterns with `;` subject continuation, literal / numeric /
  * prefixed-name objects, multi-pattern OPTIONAL groups
  * (all-or-nothing, compiled as ONE left join of the inner-joined
  * group), `{…} UNION {…}` chains, FILTER(REGEX(?v, "...")) and
  * FILTER(?v = "..."), SELECT DISTINCT, ORDER BY, LIMIT. PREFIX
  * declarations and comments are accepted and ignored.
  *
  * Dialect maps: reference queries use prefixed names (`fgt:P2`,
  * `fg:Q40454`). `predAliases` maps prefixed predicates onto the
  * store's local names and `entityAliases` maps prefixed entities
  * onto statement ids — translate once per deployment, run the .rq
  * text unchanged (SparqlSpec runs lokale-from-factgrid.rq's pattern
  * structure through exactly this path). Unknown prefixed names fail
  * loudly.
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
  * variables become equi-join keys (the hand-written BGP shape
  * Catalyst already optimizes), an OPTIONAL group one left outer
  * join, a UNION chain a union of its branch sub-plans joined back on
  * the shared variables. A query arriving as text therefore costs the
  * same as one written against the DSL. */
object Sparql {

  sealed trait Term
  final case class V(name: String) extends Term
  final case class Lit(value: String) extends Term
  final case class Num(value: Long) extends Term

  final case class Pattern(s: Term, p: String, o: Term)
  sealed trait Filt
  final case class FRegex(v: String, re: String) extends Filt
  final case class FEq(v: String, value: String) extends Filt

  /** `(COUNT(DISTINCT? ?v) AS ?alias)` projection. */
  final case class Agg(distinct: Boolean, v: String, alias: String)

  final case class Query(
      select: Seq[String], aggs: Seq[Agg], distinct: Boolean,
      patterns: Seq[Pattern],            // required BGP
      optionals: Seq[Seq[Pattern]],      // one entry per OPTIONAL group
      unions: Seq[Seq[Seq[Pattern]]],    // one entry per UNION chain; inner = branches
      filters: Seq[Filt],
      binds: Map[String, Term],          // BIND(const AS ?var) seeds
      values: Map[String, Seq[Term]],    // VALUES ?var { ... } restrictions
      groupBy: Seq[String],
      orderBy: Seq[String], limit: Option[Int])

  // ---- parser --------------------------------------------------------

  private val SelectRe = """(?is).*?SELECT\s+(DISTINCT\s+)?(.*?)\s*WHERE\s*\{(.*)\}\s*(GROUP\s+BY\s+((?:\?\w+\s*)+))?\s*(ORDER\s+BY\s+((?:\?\w+\s*)+))?\s*(LIMIT\s+(\d+))?\s*""".r
  private val ProjVarRe = """\?(\w+)""".r
  private val ProjAggRe = """(?i)\(\s*COUNT\s*\(\s*(DISTINCT\s+)?\?(\w+)\s*\)\s+AS\s+\?(\w+)\s*\)""".r
  private val OptionalRe = """(?is)OPTIONAL\s*\{([^{}]*)\}""".r
  private val UnionRe = """(?is)\{([^{}]*)\}(\s*UNION\s*\{[^{}]*\})+""".r
  private val UnionBranchRe = """(?is)\{([^{}]*)\}""".r
  // filter body: non-paren runs or ONE nested level (REGEX(...)-deep)
  private val FilterRe = """(?is)FILTER\s*\(\s*((?:[^()]|\([^()]*\))*)\s*\)\s*\.?""".r
  private val RegexRe = """(?is)REGEX\s*\(\s*\?(\w+)\s*,\s*"([^"]*)"\s*\)""".r
  private val EqRe = """(?is)\?(\w+)\s*=\s*"([^"]*)"""".r
  private val PrefixedRe = """\w+:\w+""".r
  /** Placeholder left where a keyword group was extracted — a marker
    * surviving inside a UNION chain means the group was branch-scoped. */
  private val Marker = '\u0001'
  private val BindRe = """(?is)BIND\s*\(\s*(\S+)\s+AS\s+\?(\w+)\s*\)\s*\.?""".r
  private val ValuesRe = """(?is)VALUES\s+\?(\w+)\s*\{([^{}]*)\}""".r

  private def term(tok: String): Term = tok.trim match {
    case t if t.startsWith("?")                      => V(t.drop(1))
    case t if t.startsWith("\"") && t.endsWith("\"") => Lit(t.drop(1).dropRight(1))
    case t if t.matches("-?\\d+")                    => Num(t.toLong)
    case t if PrefixedRe.matches(t)                  => Lit("\u0000prefixed:" + t) // resolved at compile
    case t => throw new IllegalArgumentException(s"unsupported term: '$t'")
  }

  /** Split only OUTSIDE double quotes (even quote count ahead). */
  private def quoteAwareSplit(s: String, sep: Char): Array[String] =
    s.split(java.util.regex.Pattern.quote(sep.toString) +
      "(?=(?:[^\"]*\"[^\"]*\")*[^\"]*$)")

  /** Statements: `.`-separated, each a triple with optional `;`
    * continuations reusing the subject (`?s p1 o1; p2 o2 .`); both
    * separators are quote-aware so literals may hold `.`/`;`. */
  private def triples(body: String): Seq[Pattern] =
    quoteAwareSplit(body, '.').map(_.trim).filter(_.nonEmpty).flatMap { stmt =>
      require(!stmt.toUpperCase.contains("FILTER"),
        s"FILTER inside a nested group (OPTIONAL / UNION branch) is unsupported: '$stmt'")
      val groups = quoteAwareSplit(stmt, ';').map(_.trim).filter(_.nonEmpty)
      val headToks = ("\"[^\"]*\"|\\S+".r).findAllIn(groups.head).toList
      require(headToks.length == 3, s"unsupported pattern (need 's p o'): '${groups.head}'")
      val subj = term(headToks.head)
      val first = Pattern(subj, headToks(1), term(headToks(2)))
      val rest = groups.tail.map { g =>
        val toks = ("\"[^\"]*\"|\\S+".r).findAllIn(g).toList
        require(toks.length == 2, s"unsupported ';' continuation (need 'p o'): '$g'")
        Pattern(subj, toks.head, term(toks(1)))
      }
      first +: rest
    }.toSeq

  /** Parse the supported SPARQL subset; throws with the offending
    * fragment on anything outside it. */
  def parse(q0: String): Query = {
    // strip comments (quote-aware: a '#' inside a string literal is
    // content, not a comment) and PREFIX lines
    val q = q0.linesIterator
      .map { l =>
        val sb = new StringBuilder; var inQ = false; var done = false
        l.foreach { ch =>
          if (!done) {
            if (ch == '"') { inQ = !inQ; sb += ch }
            else if (ch == '#' && !inQ) done = true
            else sb += ch
          }
        }
        sb.toString
      }
      .filterNot(_.trim.toUpperCase.startsWith("PREFIX"))
      .mkString("\n")
    q match {
      case SelectRe(distinct, proj, body0, _, group, _, order, _, limit) =>
        // the projection is plain vars and COUNT aggregates, in order
        val aggs = ProjAggRe.findAllMatchIn(proj).toList
          .map(m => Agg(m.group(1) != null, m.group(2), m.group(3)))
        val plainVars = ProjVarRe.findAllMatchIn(ProjAggRe.replaceAllIn(proj, " "))
          .toList.map(_.group(1))
        require(aggs.nonEmpty || plainVars.nonEmpty, "empty SELECT projection")
        var body = body0
        // keyword-anchored groups first (BIND/VALUES/OPTIONAL) — once
        // removed, a bare `{...} UNION {...}` chain can never
        // accidentally capture another construct's braces as a branch.
        // Each leaves a Marker byte so a keyword group that lived
        // INSIDE a union branch is detected (branch-scoped OPTIONAL
        // has different semantics than the hoisted global one — reject
        // loudly rather than silently compile the wrong query).
        val binds = BindRe.findAllMatchIn(body).toList
          .map(m => m.group(2) -> term(m.group(1))).toMap
        body = BindRe.replaceAllIn(body, " ")
        val values = ValuesRe.findAllMatchIn(body).toList.map { m =>
          val terms = ("\"[^\"]*\"|\\S+".r).findAllIn(m.group(2)).toList.map(term)
          require(terms.nonEmpty, s"empty VALUES block for ?${m.group(1)}")
          m.group(1) -> terms.toSeq
        }.toMap
        body = ValuesRe.replaceAllIn(body, " ")
        val opts = OptionalRe.findAllMatchIn(body).toList.map(m => triples(m.group(1)))
        body = OptionalRe.replaceAllIn(body, " ")
        val unions = UnionRe.findAllMatchIn(body).toList.map { m =>
          require(!m.matched.contains(Marker),
            "OPTIONAL/BIND/VALUES inside a UNION branch is unsupported " +
              "(branch-scoped semantics differ from the global form)")
          UnionBranchRe.findAllMatchIn(m.matched).toList.map(b => triples(b.group(1)))
        }
        body = UnionRe.replaceAllIn(body, " ")
        body = body.replace(Marker, ' ')
        val filts = FilterRe.findAllMatchIn(body).toList.map { m =>
          m.group(1).trim match {
            case RegexRe(v, re)  => FRegex(v, re)
            case EqRe(v, value)  => FEq(v, value)
            case other => throw new IllegalArgumentException(s"unsupported FILTER: '$other'")
          }
        }
        body = FilterRe.replaceAllIn(body, " ")
        require(!body.contains("{") && !body.contains("}"),
          s"unsupported nested group in: '${body.trim.take(80)}'")
        val pats = triples(body)
        require(pats.nonEmpty || unions.nonEmpty, "empty graph pattern")
        val groupVars = Option(group)
          .map(_.trim.split("\\s+").map(_.stripPrefix("?")).toSeq).getOrElse(Seq.empty)
        // aggregates ⟺ GROUP BY, and the group keys are exactly the
        // plain projected vars (both empty = one global aggregate row)
        require(if (aggs.isEmpty) groupVars.isEmpty
          else groupVars.sorted == plainVars.sorted,
          s"aggregate SELECT needs GROUP BY exactly over its plain variables " +
            s"(got GROUP BY ${groupVars.mkString(",")} vs vars ${plainVars.mkString(",")})")
        Query(
          select = plainVars, aggs = aggs,
          distinct = distinct != null,
          patterns = pats, optionals = opts, unions = unions,
          filters = filts,
          binds = binds, values = values,
          groupBy = groupVars,
          orderBy = Option(order).map(_.trim.split("\\s+").map(_.stripPrefix("?")).toSeq)
            .getOrElse(Seq.empty),
          limit = Option(limit).map(_.toInt))
      case _ => throw new IllegalArgumentException("unsupported query shape (need SELECT ... WHERE {...})")
    }
  }

  // ---- compiler ------------------------------------------------------

  /** Predicates whose objects are entities, per the store's mapping
    * dictionary — the typing source (see object doc). */
  private lazy val entityPreds: Set[String] =
    Triples.rules.collect { case r if r.oNs.isDefined => r.p }.toSet

  def compile(spark: SparkSession, dir: String, q: Query,
      predAliases: Map[String, String] = Map.empty,
      entityAliases: Map[String, Long] = Map.empty): DataFrame = {
    val st = Triples.statements(spark, dir)

    def pred(p: String): String = {
      // a variable predicate or the rdf:type shorthand would compile
      // to a constant-string filter that matches nothing — reject
      // loudly per the no-silently-wrong-results contract
      require(!p.startsWith("?"),
        s"variable predicate '$p' unsupported (enumerate predicates explicitly)")
      require(p != "a",
        "rdf:type shorthand 'a' unsupported — use the store's type predicate name")
      if (PrefixedRe.matches(p)) predAliases.getOrElse(p,
        throw new IllegalArgumentException(s"prefixed predicate '$p' has no alias in the dialect map"))
      else p
    }
    def resolve(t: Term): Term = t match {
      case Lit(v) if v.startsWith("\u0000prefixed:") =>
        val name = v.stripPrefix("\u0000prefixed:")
        Num(entityAliases.getOrElse(name,
          throw new IllegalArgumentException(s"prefixed entity '$name' has no alias in the dialect map")))
      case other => other
    }

    // BIND(const AS ?var) seeds substitute the constant into every
    // pattern position of the var (the seed-item idiom of the
    // reference's network-* queries)
    val binds = q.binds.map { case (v, t) => v -> resolve(t) }
    def subst(p: Pattern): Pattern = Pattern(
      p.s match { case V(n) if binds.contains(n) => binds(n); case s => s },
      p.p,
      p.o match { case V(n) if binds.contains(n) => binds(n); case o => o })
    val patterns = q.patterns.map(subst)
    val optionals = q.optionals.map(_.map(subst))
    val unions = q.unions.map(_.map(_.map(subst)))

    val allGroups = (patterns +: optionals) ++ unions.flatten
    // type-conflict check: every binding site of a var must agree
    val varKinds = allGroups.flatten.flatMap { p0 =>
      (p0.s match { case V(n) => Seq(n -> "entity"); case _ => Nil }) ++
        (p0.o match {
          case V(n) => Seq(n -> (if (entityPreds(pred(p0.p))) "entity" else "literal"))
          case _ => Nil
        })
    }
    varKinds.groupBy(_._1).foreach { case (v, kinds) =>
      require(kinds.map(_._2).distinct.size == 1,
        s"type conflict: ?$v bound as both entity and literal across patterns")
    }

    def frame(p0: Pattern): DataFrame = {
      val p = Pattern(resolve(p0.s), pred(p0.p), resolve(p0.o))
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
        // constants follow the SAME schema-driven typing as variables:
        // a numeric object on a literal-valued predicate compares the
        // literal column (o_id is NULL there — comparing it would
        // silently match nothing)
        case Num(v) if entityPreds(p.p) => df = df.filter(col("o_id") === v)
        case Num(v) => df = df.filter(col("o_val") === v.toString)
        case Lit(v) => df = df.filter(col("o_val") === v)
      }
      require(cols.nonEmpty, s"pattern binds no variables: $p0")
      df.select(cols.toSeq: _*)
    }

    def joinKeys(a: DataFrame, b: DataFrame): Seq[String] =
      a.columns.toSeq.intersect(b.columns.toSeq)
    /** Inner-join a pattern group into one frame (a BGP). SPARQL BGPs
      * are unordered, so connectivity is resolved to a FIXPOINT: each
      * round joins any pattern sharing a variable with the
      * accumulator, in textual order among the eligible — a BGP whose
      * connecting pattern appears last still compiles. */
    def bgp(pats: Seq[Pattern]): DataFrame = {
      val remaining = scala.collection.mutable.ListBuffer(
        pats.tail.map(p => (p, frame(p))): _*)
      var acc = frame(pats.head)
      while (remaining.nonEmpty) {
        val idx = remaining.indexWhere { case (_, f) => joinKeys(acc, f).nonEmpty }
        require(idx >= 0,
          s"pattern(s) not connected to the rest of the BGP: ${remaining.map(_._1).mkString("; ")}")
        val (_, f) = remaining.remove(idx)
        acc = acc.join(f, joinKeys(acc, f))
      }
      acc
    }

    var acc =
      if (patterns.nonEmpty) bgp(patterns)
      else { // UNION-only body: first chain is the root
        require(unions.nonEmpty, "empty graph pattern"); null
      }
    unions.foreach { branches =>
      val frames = branches.map(bgp)
      val cols0 = frames.head.columns.toSeq.sorted
      frames.tail.foreach(f => require(f.columns.toSeq.sorted == cols0,
        s"UNION branches bind different variables: $cols0 vs ${f.columns.toSeq.sorted}"))
      val u = frames.map(_.select(cols0.map(col): _*)).reduce(_ union _)
      acc = if (acc == null) u else {
        val keys = joinKeys(acc, u)
        require(keys.nonEmpty, "UNION block not connected to the rest of the BGP")
        acc.join(u, keys)
      }
    }
    optionals.foreach { group =>
      val f = bgp(group) // all-or-nothing: the group inner-joins first
      val keys = joinKeys(acc, f)
      require(keys.nonEmpty, s"OPTIONAL group not connected: $group")
      acc = acc.join(f, keys, "left_outer")
    }
    // VALUES ?v { ... } — inline-data restriction on a bound column
    q.values.foreach { case (v, terms0) =>
      val terms = terms0.map(resolve)
      require(acc.columns.contains(v), s"VALUES variable ?$v not bound by the pattern")
      val kinds = terms.map { case Num(_) => "n"; case Lit(_) => "l"; case V(x) =>
        throw new IllegalArgumentException(s"variable ?$x inside VALUES block") }.distinct
      require(kinds.size == 1, s"VALUES ?$v mixes entity and literal terms")
      acc =
        if (kinds.head == "n") acc.filter(col(v).isin(terms.collect { case Num(x) => x }: _*))
        else acc.filter(col(v).isin(terms.collect { case Lit(x) => x }: _*))
    }
    q.filters.foreach {
      case FRegex(v, re) => acc = acc.filter(col(v).rlike(re))
      case FEq(v, value) => acc = acc.filter(col(v) === value)
    }
    // a BIND-seeded var in the projection surfaces as its constant
    q.select.filter(binds.contains).foreach { v =>
      acc = acc.withColumn(v, binds(v) match {
        case Num(x) => lit(x); case Lit(x) => lit(x)
        case V(x)   => throw new IllegalArgumentException(s"BIND of variable ?$x unsupported")
      })
    }
    if (q.aggs.nonEmpty) {
      val aggCols = q.aggs.map(a =>
        (if (a.distinct) count_distinct(col(a.v)) else count(col(a.v))).as(a.alias))
      acc = acc.groupBy(q.groupBy.map(col): _*)
        .agg(aggCols.head, aggCols.tail: _*)
        .select((q.select ++ q.aggs.map(_.alias)).map(col): _*)
    } else acc = acc.select(q.select.map(col): _*)
    if (q.distinct) acc = acc.distinct()
    if (q.orderBy.nonEmpty) acc = acc.orderBy(q.orderBy.map(col): _*)
    q.limit.foreach(n => acc = acc.limit(n))
    acc
  }

  def run(spark: SparkSession, dir: String, queryText: String,
      predAliases: Map[String, String] = Map.empty,
      entityAliases: Map[String, Long] = Map.empty): DataFrame =
    compile(spark, dir, parse(queryText), predAliases, entityAliases)

  // ---- registry ------------------------------------------------------

  /** The flagship text query (the companions/label shape of the
    * reference's .rq files): BUILDING customers with their nation and
    * its label, OPTIONAL (possibly multiple) customer labels,
    * NATION_1x only. */
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

  /** Second gated text query: UNION chain + COUNT/GROUP BY (the
    * census shape of the reference's property-survey queries),
    * written in the reference's prefixed vocabulary and run through
    * the dialect maps. */
  val censusText: String =
    """PREFIX fgt: <https://database.factgrid.de/prop/direct/>
      |SELECT ?n (COUNT(?c) AS ?n_members) (COUNT(DISTINCT ?seg) AS ?n_segments) WHERE {
      |  { ?c fgt:P2 ?n . ?c mktsegment "BUILDING" . ?c mktsegment ?seg . }
      |  UNION
      |  { ?c fgt:P2 ?n . ?c mktsegment "MACHINERY" . ?c mktsegment ?seg . }
      |} GROUP BY ?n""".stripMargin

  /** kg_sparql_agg — [[censusText]] through the dialect map; UNION +
    * aggregate compilation under the hash gate. */
  def kgSparqlAgg(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, censusText, predAliases = Map("fgt:P2" -> "in_nation"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kg_sparql"     -> (kgSparql _),
    "kg_sparql_agg" -> (kgSparqlAgg _))

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
         |WHERE regexp_matches(nl.o_val, '^NATION_1')""".stripMargin,
    "kg_sparql_agg" ->
      s"""$T,
         |seg AS (SELECT s, o_val FROM triples WHERE p = 'mktsegment' AND o_val IS NOT NULL),
         |cn AS (SELECT s, o_id FROM triples WHERE p = 'in_nation'),
         |u AS (
         |  SELECT cn.s AS c, cn.o_id AS n, sv.o_val AS seg
         |  FROM cn JOIN seg sb ON sb.s = cn.s AND sb.o_val = 'BUILDING'
         |  JOIN seg sv ON sv.s = cn.s
         |  UNION ALL
         |  SELECT cn.s, cn.o_id, sv.o_val
         |  FROM cn JOIN seg sm ON sm.s = cn.s AND sm.o_val = 'MACHINERY'
         |  JOIN seg sv ON sv.s = cn.s)
         |SELECT n, count(c) AS n_members, count(DISTINCT seg) AS n_segments
         |FROM u GROUP BY n""".stripMargin)
}
