package graft.kg

/** Declarative mapping front-end: parse an RML-lite mapping document
  * into [[Triples.Rule]]s — the user-facing twin of the reference's
  * YAML mapping (`data-modeling/mappings/kg_v1.yml`, consumed by
  * `data-modeling/create-rdf.py:22`). A reference user ports their
  * mapping by editing a config file, not Scala; the engine half is
  * [[Triples.mapped]].
  *
  * Supported YAML subset (hand-rolled — the runtime ships no YAML
  * library, and the mapping needs nothing more):
  *
  * {{{
  * # namespaces give each entity class a long-id prefix
  * namespaces:
  *   region: 1
  *   nation: 2
  * mappings:
  *   - table: nation          # source table
  *     s: n_nationkey         # subject key column
  *     ns: nation             # subject namespace
  *     po:                    # predicate/object pairs
  *       - {p: in_region, o: n_regionkey, ns: region}   # entity edge
  *       - {p: label, o: n_name}                        # literal
  *       - {p: has_part, o: l_partkey, ns: part, distinct: true}
  * }}}
  *
  * Comments (`#`), blank lines, and single/double-quoted scalars are
  * accepted; anything else fails loudly with a line number — a
  * mapping config silently misread is a wrong graph.
  */
object Mapping {

  /** Parse a mapping document. Throws `IllegalArgumentException` with
    * a line number on malformed input, unknown namespace references,
    * or missing required keys. */
  def parse(text: String): Seq[Triples.Rule] = {
    // strip comments + blanks, keep (content, lineNo, indent). A '#'
    // inside a quoted scalar is content, not a comment — stripping
    // before quote parsing would silently truncate the value, exactly
    // the misread this parser promises to fail loudly on.
    def stripComment(raw: String): String = {
      var quote: Char = 0
      var i = 0
      while (i < raw.length) {
        val c = raw.charAt(i)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        else if (c == '#') return raw.take(i)
        i += 1
      }
      raw
    }
    // structure is inferred from content patterns, not indentation
    val lines = text.linesIterator.zipWithIndex.flatMap { case (raw, i) =>
      val t = stripComment(raw).trim
      if (t.isEmpty) None else Some((t, i + 1))
    }.toList

    def fail(lineNo: Int, msg: String): Nothing =
      throw new IllegalArgumentException(s"mapping config line $lineNo: $msg")
    def unquote(s: String): String = {
      val t = s.trim
      if (t.length >= 2 && ((t.head == '"' && t.last == '"') || (t.head == '\'' && t.last == '\'')))
        t.substring(1, t.length - 1)
      else t
    }
    def kv(s: String, lineNo: Int): (String, String) = s.indexOf(':') match {
      case -1 => fail(lineNo, s"expected 'key: value', got '$s'")
      case i  => (s.take(i).trim, unquote(s.drop(i + 1)))
    }
    def kvMap(pairs: Seq[(String, String)], lineNo: Int): Map[String, String] = {
      pairs.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }
        .headOption.foreach(k => fail(lineNo, s"duplicate key '$k'"))
      pairs.toMap
    }

    val namespaces = scala.collection.mutable.LinkedHashMap[String, Int]()
    def nsId(name: String, lineNo: Int): Int =
      namespaces.getOrElse(name, fail(lineNo, s"unknown namespace '$name' (declared: ${namespaces.keys.mkString(", ")})"))

    final class Item(val lineNo: Int) {
      var table: Option[String] = None
      var sKey: Option[String] = None
      var sNs: Option[String] = None
      val po = scala.collection.mutable.ListBuffer[(Map[String, String], Int)]()
      def rules: Seq[Triples.Rule] = {
        val t = table.getOrElse(fail(lineNo, "mapping item missing 'table'"))
        val s = sKey.getOrElse(fail(lineNo, s"mapping for '$t' missing 's'"))
        val n = nsId(sNs.getOrElse(fail(lineNo, s"mapping for '$t' missing 'ns'")), lineNo)
        if (po.isEmpty) fail(lineNo, s"mapping for '$t' has no 'po' entries")
        po.toSeq.map { case (m, ln) =>
          val p = m.getOrElse("p", fail(ln, "po entry missing 'p'"))
          val o = m.getOrElse("o", fail(ln, "po entry missing 'o'"))
          val oNs = m.get("ns").map(nsId(_, ln))
          val distinct = m.get("distinct") match {
            case None | Some("false") => false
            case Some("true")         => true
            case Some(x)              => fail(ln, s"distinct must be true/false, got '$x'")
          }
          m.keySet.diff(Set("p", "o", "ns", "distinct")).foreach(k => fail(ln, s"unknown po key '$k'"))
          Triples.Rule(t, s, n, p, o, oNs, distinct)
        }
      }
    }

    var section: String = ""
    var inPo = false
    val items = scala.collection.mutable.ListBuffer[Item]()
    lines.foreach { case (content, lineNo) =>
      content match {
        case "namespaces:" => section = "namespaces"; inPo = false
        case "mappings:"   => section = "mappings"; inPo = false
        case _ => section match {
          case "namespaces" =>
            val (k, v) = kv(content, lineNo)
            if (namespaces.contains(k)) fail(lineNo, s"namespace '$k' declared twice")
            namespaces(k) = try v.toInt catch {
              case _: NumberFormatException => fail(lineNo, s"namespace '$k' needs an integer id, got '$v'")
            }
          case "mappings" if content.startsWith("- {") || content.startsWith("-{") =>
            // inline-map po entry: - {p: x, o: y, ns: z} — the braces
            // must wrap the WHOLE entry (trailing text would otherwise
            // be dropped silently, and a missing '}' misparsed)
            if (!inPo || items.isEmpty) fail(lineNo, "po entry outside a 'po:' block")
            val t = content.stripPrefix("-").trim
            if (!t.endsWith("}")) fail(lineNo, s"po entry must end with '}', got '$content'")
            val body = t.stripPrefix("{").stripSuffix("}")
            if (body.contains('{') || body.contains('}'))
              fail(lineNo, s"nested braces in po entry '$content'")
            // split on commas OUTSIDE quotes only — a quoted scalar may
            // contain one (e.g. o: 'a, b'), and a naive split would
            // fail with a wrong-reason error on legal syntax
            val frags = scala.collection.mutable.ListBuffer[String]()
            val cur = new StringBuilder
            var quote: Char = 0
            body.foreach { c =>
              if (quote != 0) { if (c == quote) quote = 0; cur += c }
              else if (c == '"' || c == '\'') { quote = c; cur += c }
              else if (c == ',') { frags += cur.result(); cur.clear() }
              else cur += c
            }
            if (quote != 0) fail(lineNo, s"unterminated quote in po entry '$content'")
            frags += cur.result()
            val m = kvMap(frags.toSeq.filter(_.trim.nonEmpty).map(kv(_, lineNo)), lineNo)
            items.last.po += ((m, lineNo))
          case "mappings" if content.startsWith("- ") =>
            // new mapping item, first key on the dash line: - table: x
            val item = new Item(lineNo)
            items += item
            inPo = false
            val (k, v) = kv(content.stripPrefix("- "), lineNo)
            if (k != "table") fail(lineNo, s"mapping item must start with 'table', got '$k'")
            item.table = Some(v)
          case "mappings" =>
            if (items.isEmpty) fail(lineNo, "key outside a mapping item")
            if (content == "po:") { inPo = true }
            else {
              val (k, v) = kv(content, lineNo)
              def setOnce(slot: Option[String]): Option[String] = {
                if (slot.isDefined) fail(lineNo, s"'$k' set twice for table '${items.last.table.getOrElse("?")}'")
                Some(v)
              }
              k match {
                case "s"  => items.last.sKey = setOnce(items.last.sKey); inPo = false
                case "ns" => items.last.sNs = setOnce(items.last.sNs); inPo = false
                case x    => fail(lineNo, s"unknown mapping key '$x' (expected s/ns/po)")
              }
            }
          case _ => fail(lineNo, s"'$content' outside a section (expected 'namespaces:' or 'mappings:')")
        }
      }
    }
    if (namespaces.isEmpty) throw new IllegalArgumentException("mapping config: no namespaces declared")
    val rules = items.toSeq.flatMap(_.rules)
    if (rules.isEmpty) throw new IllegalArgumentException("mapping config: no mapping rules")
    rules
  }

  /** Parse a mapping config file from disk. */
  def load(path: String): Seq[Triples.Rule] =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))
}
