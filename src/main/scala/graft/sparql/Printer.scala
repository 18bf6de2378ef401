package graft.sparql

import graft.core.Term
import graft.core.Term._
import graft.dsl._
import graft.functions.NtExpressions

/** Pretty-printer: [[SparqlQuery]] / [[graft.dsl]] nodes → parseable
  * SPARQL text. `Parser.parse(Printer.print(q)) == q` for every query
  * built from the CANONICAL node shapes the parser itself produces
  * (the fuzzer leg pins the round-trip); it also prints any DSL-built
  * query as a debugging surface — non-canonical shapes (e.g. a
  * `FilterArith` between a bare var and a constant) print to
  * equivalent text that re-parses to the canonical node.
  *
  * Terms print in full-IRI form (no prefix machinery — printed text
  * is self-contained): keywords under the reserved `urn:graft:kw/`
  * base, exactly the interchange writers' scheme, so printed queries
  * are runnable against any store those readers loaded.
  */
object Printer {

  private val Xsd = "http://www.w3.org/2001/XMLSchema#"
  private val KwBase = "urn:graft:kw/"
  private val RelBase = "urn:graft:rel/"
  private val NilIri = "urn:graft:nil"
  private val OpaqueBase = "urn:graft:opaque/"

  private def iri(body: String): String =
    "<" + NtExpressions.iriEncode(body) + ">"

  private def str(s: String): String =
    "\"" + NtExpressions.echarEscape(s) + "\""

  /** A ground term as a SPARQL token (the parser's exact inverse —
    * [[graft.sources.Turtle.termOfIri]]/`termOfLiteral` map it back). */
  def term(t: Term): String = t match {
    case TNil            => iri(NilIri)
    case TKeyword(k)     => iri(KwBase + k)
    case TUri(u) =>
      if (u.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*")) iri(u)
      else iri(RelBase + u)
    case TString(s)      => str(s)
    case TLong(v)        => v.toString
    case TDouble(v) =>
      val s = v.toString
      // the scanner reads digits/'.'/'E'-forms; anything else (NaN,
      // Infinity) rides the typed-literal channel
      if (s.matches("^-?[0-9.]+([eE][+-]?[0-9]+)?$")) s
      else str(s) + "^^" + iri(Xsd + "double")
    case TBool(v)        => v.toString
    case TLangString(lex, lang) => str(lex) + "@" + lang
    case TTyped(lex, dt) => str(lex) + "^^" + iri(dt)
    case TDate(x)        => str(x) + "^^" + iri(Xsd + "dateTime")
    case TOpaque(tag, b64) => str(b64) + "^^" + iri(OpaqueBase + tag)
  }

  private def tv(x: TermOrVar): String = x match {
    case V(n) => "?" + n
    case T(t) => term(t)
  }

  // -------------------------------------------------------------- paths

  def path(p: PathExpr): String = p match {
    case PathPred(t)    => tv(T(t))
    case PathPlus(t)    => tv(T(t)) + "+"
    case PathAltPlus(as) =>
      as.map(a => tv(T(a))).mkString("(", "|", ")") + "+"
    case PathInv(inner) => "^" + pathPrimaryish(inner)
    case PathSeq(steps) => steps.map(pathSeqElt).mkString("/")
    case PathAlt(alts)  => alts.map(path).mkString("|")
    case PathPlusOf(inner) => pathPrimaryish(inner) + "+"
    case PathStar(inner)   => pathPrimaryish(inner) + "*"
    case PathOpt(inner)    => pathPrimaryish(inner) + "?"
    case PathRange(inner, lo, hi) => pathPrimaryish(inner) + s"{$lo,$hi}"
    case PathNeg(excluded) =>
      if (excluded.size == 1) "!" + tv(T(excluded.head))
      else excluded.map(e => tv(T(e))).mkString("!(", "|", ")")
  }

  /** A path in modifier/inverse position: parenthesize anything that
    * is not a primary, so precedence survives the round-trip. */
  private def pathPrimaryish(p: PathExpr): String = p match {
    case PathPred(t)   => tv(T(t))
    case n: PathNeg    => path(n)
    case other         => "(" + path(other) + ")"
  }

  /** A path as a sequence step: alternations need parens. */
  private def pathSeqElt(p: PathExpr): String = p match {
    case _: PathAlt => "(" + path(p) + ")"
    case other      => path(other)
  }

  // -------------------------------------------------------- expressions

  def termExpr(e: TermExpr): String = e match {
    case TVar(v)   => "?" + v.name
    case TConst(t) => term(t)
    case NVar(v)   => "?" + v.name
    case NConst(t) => term(t)
    case NAdd(a, b) => "(" + termExpr(a) + " + " + termExpr(b) + ")"
    case NSub(a, b) => "(" + termExpr(a) + " - " + termExpr(b) + ")"
    case NMul(a, b) => "(" + termExpr(a) + " * " + termExpr(b) + ")"
    case NDiv(a, b) => "(" + termExpr(a) + " / " + termExpr(b) + ")"
    case TStr(x)      => s"STR(${termExpr(x)})"
    case TLang(x)     => s"LANG(${termExpr(x)})"
    case TDatatype(x) => s"DATATYPE(${termExpr(x)})"
    case TStrlen(x)   => s"STRLEN(${termExpr(x)})"
    case TSubstr(x, s0, None)    => s"SUBSTR(${termExpr(x)}, $s0)"
    case TSubstr(x, s0, Some(l)) => s"SUBSTR(${termExpr(x)}, $s0, $l)"
    case TUcase(x) => s"UCASE(${termExpr(x)})"
    case TLcase(x) => s"LCASE(${termExpr(x)})"
    case TStrBefore(x, nd) =>
      s"STRBEFORE(${termExpr(x)}, ${termExpr(nd)})"
    case TStrAfter(x, nd) => s"STRAFTER(${termExpr(x)}, ${termExpr(nd)})"
    case TReplace(x, p, r) =>
      s"REPLACE(${termExpr(x)}, ${str(p)}, ${str(r)})"
    case TConcat(es)   => es.map(termExpr).mkString("CONCAT(", ", ", ")")
    case TCoalesce(es) => es.map(termExpr).mkString("COALESCE(", ", ", ")")
    case TStrLang(x, tag) => s"STRLANG(${termExpr(x)}, ${str(tag)})"
    case TStrDt(x, dt)    => s"STRDT(${termExpr(x)}, ${iri(dt)})"
    case TDatePart(x, f) =>
      val name = f match {
        case DfYear => "YEAR"; case DfMonth => "MONTH"; case DfDay => "DAY"
        case DfHours => "HOURS"; case DfMinutes => "MINUTES"
        case DfSeconds => "SECONDS"
      }
      s"$name(${termExpr(x)})"
    case TTz(x)       => s"TZ(${termExpr(x)})"
    case TTimezone(x) => s"TIMEZONE(${termExpr(x)})"
    case TIri(x)          => s"IRI(${termExpr(x)})"
    case TEncodeForUri(x) => s"ENCODE_FOR_URI(${termExpr(x)})"
    case TBNode(x)        => s"BNODE(${termExpr(x)})"
    case THash(x, "md5")  => s"MD5(${termExpr(x)})"
    case THash(x, _)      => s"SHA256(${termExpr(x)})"
    case TAbs(x)   => s"ABS(${termExpr(x)})"
    case TRound(x) => s"ROUND(${termExpr(x)})"
    case TCeil(x)  => s"CEIL(${termExpr(x)})"
    case TFloor(x) => s"FLOOR(${termExpr(x)})"
    case TIf(c, t, f) =>
      s"IF(${filter(c)}, ${termExpr(t)}, ${termExpr(f)})"
  }

  private def cmp(op: CmpOp): String = op match {
    case Lt => "<"; case Le => "<="; case Gt => ">"; case Ge => ">="
    case Eq => "="; case Neq => "!="
  }

  def filter(f: FilterExpr): String = f match {
    case FilterCmp(v, op, t)    => s"?${v.name} ${cmp(op)} ${term(t)}"
    case FilterVarCmp(a, op, b) => s"?${a.name} ${cmp(op)} ?${b.name}"
    case FilterArith(a, op, b) =>
      s"${termExpr(a)} ${cmp(op)} ${termExpr(b)}"
    case FilterBound(v)     => s"BOUND(?${v.name})"
    case FilterRegex(v, p, "") => s"REGEX(?${v.name}, ${str(p)})"
    case FilterRegex(v, p, fl) =>
      s"REGEX(?${v.name}, ${str(p)}, ${str(fl)})"
    case FilterAnd(es) => es.map(bracketed).mkString(" && ")
    case FilterOr(es)  => es.map(bracketed).mkString(" || ")
    case FilterNot(e)  => "!" + bracketed(e)
    case FilterStrStarts(a, b) =>
      s"STRSTARTS(${termExpr(a)}, ${termExpr(b)})"
    case FilterStrEnds(a, b) => s"STRENDS(${termExpr(a)}, ${termExpr(b)})"
    case FilterContains(a, b) =>
      s"CONTAINS(${termExpr(a)}, ${termExpr(b)})"
    case FilterLangMatches(e, r) =>
      s"LANGMATCHES(${termExpr(e)}, ${str(r)})"
    case FilterIsIri(e)     => s"isIRI(${termExpr(e)})"
    case FilterIsLiteral(e) => s"isLiteral(${termExpr(e)})"
    case FilterIsNumeric(e) => s"isNumeric(${termExpr(e)})"
    case FilterSameTerm(a, b) =>
      s"sameTerm(${termExpr(a)}, ${termExpr(b)})"
    case FilterExists(rows) => s"EXISTS ${group(rows)}"
  }

  /** An operand of &&/||/!: atoms that re-parse unambiguously stay
    * bare, compounds get parens. */
  private def bracketed(f: FilterExpr): String = f match {
    case _: FilterAnd | _: FilterOr | _: FilterNot | _: FilterCmp |
         _: FilterVarCmp | _: FilterArith => "(" + filter(f) + ")"
    case leaf => filter(leaf)
  }

  // -------------------------------------------------------------- rows

  private def indent(s: String, pad: String): String =
    s.linesIterator.mkString(pad, "\n" + pad, "")

  def row(r: PatternRow): String = r match {
    case TriplePattern(s, p, o) => s"${tv(s)} ${tv(p)} ${tv(o)} ."
    case PathPattern(s, p, o)   => s"${tv(s)} ${path(p)} ${tv(o)} ."
    case QuadPattern(s, p, o, g) =>
      s"GRAPH ${tv(g)} { ${tv(s)} ${tv(p)} ${tv(o)} . }"
    case QuadPathPattern(s, p, o, g) =>
      s"GRAPH ${tv(g)} { ${tv(s)} ${path(p)} ${tv(o)} . }"
    case Values(v, coll) =>
      s"VALUES ?${v.name} { ${coll.map(term).mkString(" ")} }"
    case ValuesTable(vs, rows) =>
      val hdr = vs.map("?" + _.name).mkString("(", " ", ")")
      val body = rows.map(_.map {
        case Some(t) => term(t)
        case None    => "UNDEF"
      }.mkString("( ", " ", " )")).mkString(" ")
      s"VALUES $hdr { $body }"
    case Optional(rows)  => s"OPTIONAL ${group(rows)}"
    case Minus(rows)     => s"MINUS ${group(rows)}"
    case NotExists(rows) => s"FILTER NOT EXISTS ${group(rows)}"
    case Union(branches) => branches.map(group).mkString(" UNION ")
    case Bind(e, as)     => s"BIND(${termExpr(e)} AS ?${as.name})"
    case f: FilterExpr   => s"FILTER (${filter(f)})"
    case ss: SubSelect =>
      val inner = new StringBuilder("SELECT ")
      if (ss.distinct) inner.append("DISTINCT ")
      inner.append(selectItems(ss.proj, ss.aggs))
      inner.append(" WHERE ").append(group(ss.rows))
      if (ss.groupBy.nonEmpty)
        inner.append(ss.groupBy.map("?" + _.name)
          .mkString(" GROUP BY ", " ", ""))
      for (h <- ss.having) inner.append(s" HAVING (${filter(h)})")
      if (ss.orderBy.nonEmpty)
        inner.append(ss.orderBy.map(ok =>
          if (ok.asc) "?" + ok.v.name else s"DESC(?${ok.v.name})")
          .mkString(" ORDER BY ", " ", ""))
      if (ss.limit >= 0) inner.append(s" LIMIT ${ss.limit}")
      if (ss.offset > 0) inner.append(s" OFFSET ${ss.offset}")
      s"{ ${inner.toString} }"
  }

  def group(rows: Seq[PatternRow]): String =
    if (rows.isEmpty) "{ }"
    else "{\n" + rows.map(r => indent(row(r), "  ")).mkString("\n") + "\n}"

  private def selectItems(proj: Seq[V], aggs: Seq[Agg],
                          postBinds: Seq[Bind] = Nil): String = {
    val aggOf = aggs.map(a => a.as.name -> a).toMap
    val bindOf = postBinds.map(b => b.as.name -> b).toMap
    proj.map { v =>
      aggOf.get(v.name) match {
        case None if bindOf.contains(v.name) =>
          s"(${termExpr(bindOf(v.name).expr)} AS ?${v.name})"
        case None => "?" + v.name
        case Some(a) =>
          val arg = a.v match {
            case None    => "*"
            case Some(x) => (if (a.distinct) "DISTINCT " else "") + "?" + x.name
          }
          val call = a.fn match {
            case AggCount  => s"COUNT($arg)"
            case AggSum    => s"SUM($arg)"
            case AggAvg    => s"AVG($arg)"
            case AggMin    => s"MIN($arg)"
            case AggMax    => s"MAX($arg)"
            case AggSample => s"SAMPLE($arg)"
            case AggGroupConcat(sep) =>
              s"GROUP_CONCAT($arg; SEPARATOR=${str(sep)})"
          }
          s"($call AS ?${v.name})"
      }
    }.mkString(" ")
  }

  // ------------------------------------------------------------ update

  private val DefaultG: Term = graft.core.QuadDb.DefaultGraph

  private def quadTemplate(
      t: (TermOrVar, TermOrVar, TermOrVar, TermOrVar)): String = {
    val triple = s"${tv(t._1)} ${tv(t._2)} ${tv(t._3)} ."
    t._4 match {
      case T(DefaultG) => s"  $triple"
      case g           => s"  GRAPH ${tv(g)} { $triple }"
    }
  }

  private def quadBlock(
      ts: Seq[(TermOrVar, TermOrVar, TermOrVar, TermOrVar)]): String =
    ts.map(quadTemplate).mkString("{\n", "\n", "\n}")

  private def graphOrDefault(g: Term): String =
    if (g == DefaultG) "DEFAULT" else s"GRAPH ${term(g)}"

  def printOp(op: UpdateOp): String = op match {
    case InsertData(qs) =>
      "INSERT DATA " + quadBlock(qs.map(q =>
        (T(q._1): TermOrVar, T(q._2): TermOrVar, T(q._3): TermOrVar,
          T(q._4): TermOrVar)))
    case DeleteData(qs) =>
      "DELETE DATA " + quadBlock(qs.map(q =>
        (T(q._1): TermOrVar, T(q._2): TermOrVar, T(q._3): TermOrVar,
          T(q._4): TermOrVar)))
    case Modify(del, ins, where) =>
      val d = if (del.isEmpty) "" else "DELETE " + quadBlock(del) + "\n"
      val i = if (ins.isEmpty) "" else "INSERT " + quadBlock(ins) + "\n"
      d + i + "WHERE " + group(where)
    case LoadOp(file, g, silent) =>
      val into = if (g == DefaultG) "" else s" INTO GRAPH ${term(g)}"
      val sil = if (silent) "SILENT " else ""
      s"LOAD $sil<${NtExpressions.iriEncode(file)}>$into"
    case ClearOp(None)    => "CLEAR ALL"
    case ClearOp(Some(g)) => "CLEAR " + graphOrDefault(g)
    case ClearNamedOp     => "CLEAR NAMED"
    case CreateOp(g, silent) =>
      s"CREATE ${if (silent) "SILENT " else ""}GRAPH ${term(g)}"
    case CopyOp(f, t) => s"COPY ${graphOrDefault(f)} TO ${graphOrDefault(t)}"
    case MoveOp(f, t) => s"MOVE ${graphOrDefault(f)} TO ${graphOrDefault(t)}"
    case AddOp(f, t)  => s"ADD ${graphOrDefault(f)} TO ${graphOrDefault(t)}"
  }

  /** A whole update request (';'-separated, like the grammar). */
  def printUpdate(ops: Seq[UpdateOp]): String =
    ops.map(printOp).mkString(" ;\n")

  // ------------------------------------------------------------ queries

  private def datasetLines(d: Option[Dataset]): String = d match {
    case None => ""
    case Some(ds) =>
      (ds.default.map(g => s"\nFROM ${term(g)}") ++
        ds.named.map(g => s"\nFROM NAMED ${term(g)}")).mkString
  }

  def print(q: SparqlQuery): String = q match {
    case s: SelectQuery =>
      val b = new StringBuilder("SELECT ")
      if (s.distinct) b.append("DISTINCT ")
      if (s.proj.isEmpty) b.append("*")
      else b.append(selectItems(s.proj, s.aggs, s.postBinds))
      b.append(datasetLines(s.dataset))
      b.append("\nWHERE ").append(group(s.where))
      if (s.groupBy.nonEmpty)
        b.append("\nGROUP BY ").append(s.groupBy.map {
          case (TVar(v), as) if v.name == as.name => "?" + as.name
          case (e, as) => s"(${termExpr(e)} AS ?${as.name})"
        }.mkString(" "))
      for (h <- s.having) b.append(s"\nHAVING (${filter(h)})")
      if (s.orderBy.nonEmpty)
        b.append("\nORDER BY ").append(s.orderBy.map {
          case (TVar(v), true) => "?" + v.name
          case (e, true)       => s"ASC(${termExpr(e)})"
          case (e, false)      => s"DESC(${termExpr(e)})"
        }.mkString(" "))
      if (s.limit >= 0) b.append(s"\nLIMIT ${s.limit}")
      if (s.offset > 0) b.append(s"\nOFFSET ${s.offset}")
      b.toString
    case c: ConstructQuery =>
      "CONSTRUCT {\n" +
        c.templates.map { case (s, p, o) =>
          s"  ${tv(s)} ${tv(p)} ${tv(o)} ."
        }.mkString("\n") +
        "\n}" + datasetLines(c.dataset) + "\nWHERE " + group(c.where)
    case a: AskQuery =>
      "ASK" + datasetLines(a.dataset) + " " + group(a.where)
    case d: DescribeQuery =>
      s"DESCRIBE ?${d.v.name}" + datasetLines(d.dataset) +
        " WHERE " + group(d.where)
  }
}
