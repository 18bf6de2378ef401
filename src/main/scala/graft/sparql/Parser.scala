package graft.sparql

import graft.core.Term
import graft.core.Term._
import graft.dsl._
import graft.functions.NtExpressions
import graft.sources.Turtle

import scala.collection.mutable

/** SPARQL 1.1 recursive-descent parser → the [[graft.dsl]] AST.
  *
  * Architecture precedent: the reference splits grammar validation
  * from compilation (alpha.clj:130-173's spec grammar feeding the
  * compile fold at alpha.clj:193-203); this front-end does the same
  * split one layer up — text → AST here, AST → plan in
  * [[graft.engine.BgpCompiler]], which is byte-identical to the DSL
  * path because the parser only CONSTRUCTS the existing nodes. The
  * scanner discipline is [[graft.sources.Turtle]]'s (offset-tracked
  * recursive descent), with line:column diagnostics.
  *
  * Everything outside the implemented subset fails LOUDLY with a
  * position: `@base`/relative IRIs, blank nodes, bare nested groups
  * (their FILTER scoping differs from splicing — use OPTIONAL / UNION
  * / GRAPH / a subquery), SERVICE, EBV coercion of a bare term in
  * boolean position, arithmetic over computed terms (the NumExpr
  * leaves are vars and numeric constants, per the AST), dynamic
  * second arguments where the AST pins constants (REPLACE / STRLANG /
  * STRDT / LANGMATCHES / SUBSTR), and every §17.4 function without a
  * deterministic-subset implementation (NOW / RAND / UUID / SHA1 ...).
  *
  * Canonical normalizations (what makes print→parse round-trips
  * IDENTITY, pinned by the fuzzer leg):
  *   - a comparison of a variable against a ground term is
  *     [[FilterCmp]] (constant-side-first flips the operator), two
  *     variables [[FilterVarCmp]], anything else [[FilterArith]];
  *   - `elt+` over one predicate is [[PathPlus]], over a predicate
  *     alternation [[PathAltPlus]] (the tighter edge-scan plans),
  *     [[PathPlusOf]] otherwise; a bare predicate path is a plain
  *     triple pattern;
  *   - `FILTER NOT EXISTS { … }` as the WHOLE filter is the
  *     [[NotExists]] row (spec-pinned ≡); inside an expression it
  *     stays `FilterNot(FilterExists(…))`;
  *   - `SELECT (expr AS ?x)` without aggregates desugars to a
  *     trailing [[Bind]] row (§18.2.4 Extend).
  */
object Parser {
  /** Parse one SPARQL query string. */
  def parse(text: String): SparqlQuery = new Parser(text).parseQuery()

  /** Parse one SPARQL Update request (a ';'-separated op sequence). */
  def parseUpdate(text: String): Seq[UpdateOp] =
    new Parser(text).parseUpdateRequest()
}

/** A parsed expression: boolean-valued (a filter) or term-valued. */
private sealed trait PExpr
private final case class PB(f: FilterExpr) extends PExpr
private final case class PT(e: TermExpr) extends PExpr

private final class Parser(doc: String) {
  private var i = 0
  private val n = doc.length
  private val prefixes = mutable.Map.empty[String, String]
  private var freshN = 0

  private def fail(msg: String): Nothing = {
    var line = 1; var col = 1; var j = 0
    while (j < i && j < n) {
      if (doc.charAt(j) == '\n') { line += 1; col = 1 } else col += 1
      j += 1
    }
    val ctx = doc.substring(i, math.min(n, i + 24)).replace("\n", "\\n")
    throw new InvalidBgp(
      s"SPARQL parse error at $line:$col ('$ctx…'): $msg")
  }

  // ------------------------------------------------------------ scanner

  private def skipWs(): Unit = {
    var go = true
    while (go && i < n) {
      val c = doc.charAt(i)
      if (c == '#') { while (i < n && doc.charAt(i) != '\n') i += 1 }
      else if (Character.isWhitespace(c)) i += 1
      else go = false
    }
  }

  private def peek: Char = if (i < n) doc.charAt(i) else '\u0000'
  private def peekAt(k: Int): Char =
    if (i + k < n) doc.charAt(i + k) else '\u0000'

  private def expect(c: Char): Unit = {
    skipWs()
    if (peek != c) fail(s"expected '$c'")
    i += 1
  }

  private def wordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  /** Case-insensitive keyword lookahead at a word boundary. */
  private def peekWord(w: String): Boolean = {
    skipWs()
    doc.regionMatches(true, i, w, 0, w.length) &&
      (i + w.length >= n || !wordChar(doc.charAt(i + w.length)))
  }

  private def eatWord(w: String): Boolean = {
    if (!peekWord(w)) return false
    i += w.length
    true
  }

  private def expectWord(w: String): Unit =
    if (!eatWord(w)) fail(s"expected '$w'")

  // ------------------------------------------------------------- terms

  private def parseVar(): V = {
    skipWs()
    if (peek != '?' && peek != '$') fail("expected a ?variable")
    i += 1
    val start = i
    while (i < n && wordChar(doc.charAt(i))) i += 1
    if (i == start) fail("empty variable name")
    V(doc.substring(start, i))
  }

  private def iriRef(): String = {
    skipWs()
    expect('<')
    val start = i
    while (i < n && doc.charAt(i) != '>') i += 1
    if (i >= n) fail("unterminated IRIREF")
    val body = doc.substring(start, i)
    i += 1
    NtExpressions.iriDecode(body)
  }

  private def pnameChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_' || c == '-' || c == '.'

  /** A prefixed name → expanded IRI string. */
  private def prefixedIri(): String = {
    skipWs()
    val start = i
    while (i < n && doc.charAt(i) != ':' && pnameChar(doc.charAt(i))) i += 1
    if (peek != ':') { i = start; fail("expected a term") }
    val pfx = doc.substring(start, i)
    i += 1
    val lstart = i
    while (i < n && pnameChar(doc.charAt(i))) i += 1
    while (i > lstart && doc.charAt(i - 1) == '.') i -= 1 // PN_LOCAL: no trailing '.'
    val local = doc.substring(lstart, i)
    prefixes.getOrElse(pfx, fail(s"undeclared prefix '$pfx:'")) + local
  }

  /** An IRI in either form → the engine's term mapping (the reserved
    * urn:graft: bases decode to native kinds, Turtle's pin). */
  private def iriTerm(): Term = {
    skipWs()
    if (peek == '<') Turtle.termOfIri(iriRef())
    else Turtle.termOfIri(prefixedIri())
  }

  private def stringBody(): String = {
    val q = peek
    val long = peekAt(1) == q && peekAt(2) == q
    if (long) {
      i += 3
      val k = doc.indexOf(s"$q$q$q", i)
      if (k < 0) fail("unterminated long string literal")
      var end = k + 3
      while (end < n && doc.charAt(end) == q) end += 1
      val body = doc.substring(i, end - 3)
      i = end
      NtExpressions.echarUnescape(body)
    } else {
      i += 1
      val b = new java.lang.StringBuilder
      var done = false
      while (!done) {
        if (i >= n) fail("unterminated string literal")
        val c = doc.charAt(i)
        if (c == q) { i += 1; done = true }
        else if (c == '\n' || c == '\r') fail("raw newline in string literal")
        else if (c == '\\') {
          if (i + 1 >= n) fail("dangling escape")
          b.append(c).append(doc.charAt(i + 1)); i += 2
        } else { b.append(c); i += 1 }
      }
      NtExpressions.echarUnescape(b.toString)
    }
  }

  private def literal(): Term = {
    val lex = stringBody()
    if (peek == '@') {
      i += 1
      val start = i
      while (i < n && (Character.isLetterOrDigit(doc.charAt(i)) ||
        doc.charAt(i) == '-')) i += 1
      if (i == start) fail("empty language tag")
      Turtle.termOfLiteral(lex, doc.substring(start, i), "")
    } else if (peek == '^' && peekAt(1) == '^') {
      i += 2
      skipWs()
      val dt = if (peek == '<') iriRef() else prefixedIri()
      Turtle.termOfLiteral(lex, "", dt)
    } else Turtle.termOfLiteral(lex, "", "")
  }

  private def numericLiteral(): Term = {
    skipWs()
    val start = i
    if (peek == '+' || peek == '-') i += 1
    var isDouble = false
    var go = true
    while (go && i < n) {
      val c = doc.charAt(i)
      if (c.isDigit) i += 1
      else if (c == '.' && i + 1 < n && doc.charAt(i + 1).isDigit) {
        isDouble = true; i += 1
      } else if ((c == 'e' || c == 'E') && i > start) {
        isDouble = true; i += 1
        if (peek == '+' || peek == '-') i += 1
      } else go = false
    }
    val tok = doc.substring(start, i)
    if (tok.isEmpty || tok == "+" || tok == "-") fail("malformed number")
    if (isDouble) TDouble(tok.toDouble) else TLong(tok.toLong)
  }

  /** A ground term in pattern/expression position. */
  private def groundTerm(): Term = {
    skipWs()
    peek match {
      case '<'        => iriTerm()
      case '"' | '\'' => literal()
      case '_' if peekAt(1) == ':' =>
        fail("blank nodes are outside the Term model — skolemize to " +
          "IRIs (the interchange readers' bnodes=\"skolem\" contract)")
      case '[' => fail("anonymous blank nodes ([...]) are outside the " +
        "Term model")
      case c if c == '+' || c == '-' || c.isDigit => numericLiteral()
      case _ if peekWord("true")  => i += 4; TBool(true)
      case _ if peekWord("false") => i += 5; TBool(false)
      case _ => iriTerm()
    }
  }

  private def termOrVar(): TermOrVar = {
    skipWs()
    if (peek == '?' || peek == '$') parseVar() else T(groundTerm())
  }

  // ------------------------------------------------------------- paths

  private val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

  /** A verb: `a`, a plain predicate, or a property path. Returns
    * Left(predicate TermOrVar) for the plain-pattern form, Right(path). */
  private def verb(): Either[TermOrVar, PathExpr] = {
    skipWs()
    if (peek == '?' || peek == '$') return Left(parseVar())
    // 'a' is case-SENSITIVE and must not open a prefixed name (`a:x`)
    if (peek == 'a' && !wordChar(peekAt(1)) && peekAt(1) != ':') {
      i += 1; return Left(T(Turtle.termOfIri(RdfType)))
    }
    val p = path()
    p match {
      case PathPred(t) => Left(T(t))
      case other       => Right(other)
    }
  }

  private def path(): PathExpr = {
    val alts = mutable.ArrayBuffer(pathSeq())
    skipWs()
    while (peek == '|') { i += 1; alts += pathSeq(); skipWs() }
    if (alts.size == 1) alts.head else PathAlt(alts.toSeq)
  }

  private def pathSeq(): PathExpr = {
    val steps = mutable.ArrayBuffer(pathEltOrInverse())
    skipWs()
    while (peek == '/') { i += 1; steps += pathEltOrInverse(); skipWs() }
    if (steps.size == 1) steps.head else PathSeq(steps.toSeq)
  }

  private def pathEltOrInverse(): PathExpr = {
    skipWs()
    if (peek == '^') { i += 1; PathInv(pathElt()) } else pathElt()
  }

  private def pathElt(): PathExpr = {
    val prim = pathPrimary()
    // modifiers attach WITHOUT whitespace (subset restriction, and what
    // every pretty-printer emits): `<p>+ 5` is a path into object 5,
    // `<p> +5` a plain predicate into literal +5 — no skipWs here
    peek match {
      case '+' =>
        i += 1
        prim match {
          // the tighter ground-predicate closures (canonical forms)
          case PathPred(p) => PathPlus(p)
          case PathAlt(as) if as.forall(_.isInstanceOf[PathPred]) =>
            PathAltPlus(as.map(_.asInstanceOf[PathPred].pred))
          case other => PathPlusOf(other)
        }
      case '*' => i += 1; PathStar(prim)
      case '?' if !wordChar(peekAt(1)) && peekAt(1) != '?' =>
        // '?x' would be a variable — a path '?' is never followed by
        // a name char
        i += 1; PathOpt(prim)
      case '{' =>
        i += 1; skipWs()
        val lo = numericLiteral() match {
          case TLong(v) if v >= 0 => v.toInt
          case other => fail(s"path quantifier min must be a non-negative " +
            s"integer, got $other")
        }
        skipWs()
        var unbounded = false
        val hi = if (peek == ',') {
          i += 1; skipWs()
          if (peek == '}') { unbounded = true; lo } // elt{n,}
          else numericLiteral() match {
            case TLong(v) => v.toInt
            case other => fail(s"path quantifier max must be an integer, " +
              s"got $other")
          }
        } else lo
        expect('}')
        if (!unbounded) PathRange(prim, lo, hi)
        else {
          // elt{n,} desugars onto the existing fixpoint algebra
          // (one-way sugar, like DESCRIBE <iri>): {0,} = elt*,
          // {1,} = elt+, {n,} = n-1 fixed steps then elt+
          def plusOf(p2: PathExpr): PathExpr = p2 match {
            case PathPred(t) => PathPlus(t)
            case PathAlt(as) if as.forall(_.isInstanceOf[PathPred]) =>
              PathAltPlus(as.map(_.asInstanceOf[PathPred].pred))
            case other => PathPlusOf(other)
          }
          lo match {
            case 0 => PathStar(prim)
            case 1 => plusOf(prim)
            case m => PathSeq(Seq.fill(m - 1)(prim) :+ plusOf(prim))
          }
        }
      case _ => prim
    }
  }

  private def pathPrimary(): PathExpr = {
    skipWs()
    peek match {
      case '(' =>
        i += 1
        val p = path()
        expect(')')
        p
      case '!' =>
        i += 1
        // PathNegatedPropertySet: iri | ^iri | '(' (iri|^iri) ('|' …)* ')'
        val members = mutable.ArrayBuffer.empty[(Boolean, Term)] // (inverse?, pred)
        def member(): Unit = {
          skipWs()
          if (peek == '^') { i += 1; members += ((true, iriTerm())) }
          else members += ((false, iriTerm()))
        }
        skipWs()
        if (peek == '(') {
          i += 1
          member(); skipWs()
          while (peek == '|') { i += 1; member(); skipWs() }
          expect(')')
        } else member()
        val fwd = members.collect { case (false, p) => p }.toSeq
        val inv = members.collect { case (true, p) => p }.toSeq
        // the documented composition (Ast.PathNeg): mixed sets are the
        // union of the forward complement and the inverted one
        (fwd, inv) match {
          case (f, Seq()) => PathNeg(f)
          case (Seq(), v) => PathInv(PathNeg(v))
          case (f, v)     => PathAlt(Seq(PathNeg(f), PathInv(PathNeg(v))))
        }
      case '^' | '?' | '$' =>
        fail("expected a path primary (an IRI, a negated set, or a " +
          "parenthesized path)")
      case _ => PathPred(iriTerm())
    }
  }

  // ------------------------------------------------- expression grammar

  private def requireB(p: PExpr, what: String): FilterExpr = p match {
    case PB(f) => f
    case PT(_) => fail(s"$what needs a boolean expression — the effective" +
      " boolean value of a bare term is outside the subset (write an" +
      " explicit comparison)")
  }
  private def requireT(p: PExpr, what: String): TermExpr = p match {
    case PT(e) => e
    case PB(_) => fail(s"$what needs a term-valued expression, got a" +
      " boolean one (boolean-valued functions are filters in this subset)")
  }

  private def expression(): PExpr = orExpr()

  private def orExpr(): PExpr = {
    var l = andExpr()
    skipWs()
    if (peek == '|' && peekAt(1) == '|') {
      val ops = mutable.ArrayBuffer(requireB(l, "'||'"))
      while (peek == '|' && peekAt(1) == '|') {
        i += 2; ops += requireB(andExpr(), "'||'"); skipWs()
      }
      l = PB(FilterOr(ops.toSeq))
    }
    l
  }

  private def andExpr(): PExpr = {
    var l = relExpr()
    skipWs()
    if (peek == '&' && peekAt(1) == '&') {
      val ops = mutable.ArrayBuffer(requireB(l, "'&&'"))
      while (peek == '&' && peekAt(1) == '&') {
        i += 2; ops += requireB(relExpr(), "'&&'"); skipWs()
      }
      l = PB(FilterAnd(ops.toSeq))
    }
    l
  }

  private def flip(op: CmpOp): CmpOp = op match {
    case Lt => Gt; case Gt => Lt; case Le => Ge; case Ge => Le
    case Eq => Eq; case Neq => Neq
  }

  /** The canonical comparison forms (round-trip identity). */
  private def cmpOf(a: TermExpr, op: CmpOp, b: TermExpr): FilterExpr =
    (a, b) match {
      case (TVar(x), TConst(t)) => FilterCmp(x, op, t)
      case (TConst(t), TVar(x)) => FilterCmp(x, flip(op), t)
      case (TVar(x), TVar(y))   => FilterVarCmp(x, op, y)
      case _                    => FilterArith(a, op, b)
    }

  private def relExpr(): PExpr = {
    val l = addExpr()
    skipWs()
    val op: Option[CmpOp] =
      if (peek == '<' && peekAt(1) == '=') { i += 2; Some(Le) }
      else if (peek == '>' && peekAt(1) == '=') { i += 2; Some(Ge) }
      else if (peek == '!' && peekAt(1) == '=') { i += 2; Some(Neq) }
      else if (peek == '=') { i += 1; Some(Eq) }
      else if (peek == '<') { i += 1; Some(Lt) }
      else if (peek == '>') { i += 1; Some(Gt) }
      else None
    op match {
      case Some(o) =>
        val r = addExpr()
        PB(cmpOf(requireT(l, "comparison"), o, requireT(r, "comparison")))
      case None =>
        if (peekWord("IN") || (peekWord("NOT") && {
          val save = i; i += 3
          val isIn = peekWord("IN"); i = save; isIn
        })) {
          val negated = eatWord("NOT")
          if (negated) skipWs()
          expectWord("IN")
          val v = requireT(l, "IN") match {
            case TVar(x) => x
            case _ => fail("IN's left side must be a variable (the " +
              "§17.4.1.9 OR-chain expansion)")
          }
          expect('(')
          val terms = mutable.ArrayBuffer(groundTerm())
          skipWs()
          while (peek == ',') { i += 1; terms += groundTerm(); skipWs() }
          expect(')')
          val in = FilterIn(v, terms.toSeq)
          PB(if (negated) FilterNot(in) else in)
        } else l
    }
  }

  private def toNum(e: TermExpr): NumExpr = e match {
    case nx: NumExpr => nx
    case TVar(v)     => NVar(v)
    case TConst(t @ (TLong(_) | TDouble(_))) => NConst(t)
    case other => fail("arithmetic is defined over variables and numeric" +
      s" constants (the NumExpr subset) — got $other; BIND the computed" +
      " term first")
  }

  private def addExpr(): PExpr = {
    var l = mulExpr()
    skipWs()
    while (peek == '+' || peek == '-') {
      // the operator is consumed FIRST, so `?x - 2` parses as
      // NSub(?x, 2) — a sign never fuses into the right literal here
      val op = peek; i += 1
      val r = mulExpr()
      val a = toNum(requireT(l, "arithmetic"))
      val b = toNum(requireT(r, "arithmetic"))
      l = PT(if (op == '+') NAdd(a, b) else NSub(a, b))
      skipWs()
    }
    l
  }

  private def mulExpr(): PExpr = {
    var l = unaryExpr()
    skipWs()
    while (peek == '*' || peek == '/') {
      val op = peek; i += 1
      val r = unaryExpr()
      val a = toNum(requireT(l, "arithmetic"))
      val b = toNum(requireT(r, "arithmetic"))
      l = PT(if (op == '*') NMul(a, b) else NDiv(a, b))
      skipWs()
    }
    l
  }

  private def unaryExpr(): PExpr = {
    skipWs()
    if (peek == '!' && peekAt(1) != '=') {
      i += 1
      PB(FilterNot(requireB(primaryExpr(), "'!'")))
    } else primaryExpr()
  }

  private def primaryExpr(): PExpr = {
    skipWs()
    peek match {
      case '(' =>
        i += 1
        val e = expression()
        expect(')')
        e
      case '?' | '$' => PT(TVar(parseVar()))
      case '"' | '\'' => PT(TConst(literal()))
      case c if c == '+' || c == '-' || c.isDigit =>
        PT(TConst(numericLiteral()))
      case '<' => PT(TConst(iriTerm()))
      case _ if peekWord("true")  => i += 4; PT(TConst(TBool(true)))
      case _ if peekWord("false") => i += 5; PT(TConst(TBool(false)))
      case _ =>
        // a prefixed-name constant (lookahead for ':' past the name —
        // builtin function names never contain one)
        var j = i
        while (j < n && pnameChar(doc.charAt(j)) && doc.charAt(j) != ':')
          j += 1
        if (j < n && doc.charAt(j) == ':') PT(TConst(iriTerm()))
        else builtInCall()
    }
  }

  // one TermExpr argument in parens
  private def arg1(): TermExpr = {
    expect('(')
    val e = requireT(expression(), "this function")
    expect(')')
    e
  }

  private def argN(min: Int): Seq[TermExpr] = {
    expect('(')
    val es = mutable.ArrayBuffer(requireT(expression(), "this function"))
    skipWs()
    while (peek == ',') {
      i += 1; es += requireT(expression(), "this function"); skipWs()
    }
    expect(')')
    if (es.size < min) fail(s"needs at least $min arguments")
    es.toSeq
  }

  private def constStringArg(what: String): String = {
    skipWs()
    if (peek != '"' && peek != '\'')
      fail(s"$what must be a constant string (the deterministic subset)")
    literal() match {
      case TString(s) => s
      case other => fail(s"$what must be a plain string, got $other")
    }
  }

  private def builtInCall(): PExpr = {
    skipWs()
    val start = i
    while (i < n && wordChar(doc.charAt(i))) i += 1
    val name = doc.substring(start, i).toUpperCase
    def t1(f: TermExpr => TermExpr): PExpr = PT(f(arg1()))
    def b1(f: TermExpr => FilterExpr): PExpr = PB(f(arg1()))
    def t2(f: (TermExpr, TermExpr) => TermExpr): PExpr = {
      val es = argN(2)
      if (es.size != 2) fail(s"$name takes exactly 2 arguments")
      PT(f(es(0), es(1)))
    }
    def b2(f: (TermExpr, TermExpr) => FilterExpr): PExpr = {
      val es = argN(2)
      if (es.size != 2) fail(s"$name takes exactly 2 arguments")
      PB(f(es(0), es(1)))
    }
    name match {
      case "STR"      => t1(TStr(_))
      case "LANG"     => t1(TLang(_))
      case "DATATYPE" => t1(TDatatype(_))
      case "STRLEN"   => t1(TStrlen(_))
      case "UCASE"    => t1(TUcase(_))
      case "LCASE"    => t1(TLcase(_))
      case "STRBEFORE" => t2(TStrBefore(_, _))
      case "STRAFTER"  => t2(TStrAfter(_, _))
      case "CONCAT"    => PT(TConcat(argN(1)))
      case "COALESCE"  => PT(TCoalesce(argN(1)))
      case "ABS"   => t1(TAbs(_))
      case "ROUND" => t1(TRound(_))
      case "CEIL"  => t1(TCeil(_))
      case "FLOOR" => t1(TFloor(_))
      case "YEAR"    => t1(TDatePart(_, DfYear))
      case "MONTH"   => t1(TDatePart(_, DfMonth))
      case "DAY"     => t1(TDatePart(_, DfDay))
      case "HOURS"   => t1(TDatePart(_, DfHours))
      case "MINUTES" => t1(TDatePart(_, DfMinutes))
      case "SECONDS" => t1(TDatePart(_, DfSeconds))
      case "TZ"       => t1(TTz(_))
      case "TIMEZONE" => t1(TTimezone(_))
      case "IRI" | "URI" => t1(TIri(_))
      case "ENCODE_FOR_URI" => t1(TEncodeForUri(_))
      case "BNODE" =>
        expect('(')
        skipWs()
        if (peek == ')') fail("BNODE() with no argument is outside " +
          "the deterministic subset (a per-call gensym is not replayable)" +
          " — BNODE(str) mints a stable skolem node")
        val e = requireT(expression(), "BNODE")
        expect(')')
        PT(TBNode(e))
      case "MD5"    => t1(THash(_, "md5"))
      case "SHA256" => t1(THash(_, "sha256"))
      case "SHA1" | "SHA384" | "SHA512" => fail(
        s"$name has no oracle twin — the deterministic subset ships MD5" +
          " and SHA256 only")
      case "SUBSTR" =>
        expect('(')
        val e = requireT(expression(), "SUBSTR")
        expect(',')
        skipWs()
        val s0 = numericLiteral() match {
          case TLong(v) => v.toInt
          case other => fail(s"SUBSTR start must be an integer, got $other")
        }
        skipWs()
        val len = if (peek == ',') {
          i += 1; skipWs()
          numericLiteral() match {
            case TLong(v) => Some(v.toInt)
            case other => fail(s"SUBSTR length must be an integer, got $other")
          }
        } else None
        expect(')')
        PT(TSubstr(e, s0, len))
      case "REPLACE" =>
        expect('(')
        val e = requireT(expression(), "REPLACE")
        expect(','); val pat = constStringArg("REPLACE's pattern")
        expect(','); val rep = constStringArg("REPLACE's replacement")
        expect(')')
        PT(TReplace(e, pat, rep))
      case "STRLANG" =>
        expect('(')
        val e = requireT(expression(), "STRLANG")
        expect(','); val tag = constStringArg("STRLANG's tag")
        expect(')')
        PT(TStrLang(e, tag))
      case "STRDT" =>
        expect('(')
        val e = requireT(expression(), "STRDT")
        expect(',')
        skipWs()
        val dt =
          if (peek == '<') iriRef()
          else if (peek == '"' || peek == '\'')
            fail("STRDT's datatype must be an IRI")
          else prefixedIri()
        expect(')')
        PT(TStrDt(e, dt))
      case "IF" =>
        expect('(')
        val c = requireB(expression(), "IF's condition")
        expect(',')
        val t = requireT(expression(), "IF's then-branch")
        expect(',')
        val f = requireT(expression(), "IF's else-branch")
        expect(')')
        PT(TIf(c, t, f))
      case "BOUND" =>
        expect('(')
        val v = parseVar()
        expect(')')
        PB(FilterBound(v))
      case "REGEX" =>
        expect('(')
        skipWs()
        val v = if (peek == '?' || peek == '$') parseVar()
          else fail("REGEX's first argument must be a variable in this " +
            "subset")
        expect(','); val pat = constStringArg("REGEX's pattern")
        skipWs()
        val flags = if (peek == ',') {
          i += 1
          val fl = constStringArg("REGEX's flags")
          fl.foreach { c =>
            if (!"ism".contains(c)) fail(s"REGEX flag '$c' is outside " +
              "the portable subset (i, s, m — Java and RE2 read the " +
              "inline (?ism) prefix identically; x/q do not lower " +
              "portably)")
          }
          if (fl.distinct != fl) fail(s"duplicate REGEX flags '$fl'")
          fl
        } else ""
        expect(')')
        PB(FilterRegex(v, pat, flags))
      case "STRSTARTS" => b2(FilterStrStarts(_, _))
      case "STRENDS"   => b2(FilterStrEnds(_, _))
      case "CONTAINS"  => b2(FilterContains(_, _))
      case "LANGMATCHES" =>
        expect('(')
        val e = requireT(expression(), "LANGMATCHES")
        expect(','); val range = constStringArg("LANGMATCHES's range")
        expect(')')
        PB(FilterLangMatches(e, range))
      case "ISIRI" | "ISURI" => b1(FilterIsIri(_))
      case "ISLITERAL"       => b1(FilterIsLiteral(_))
      case "ISNUMERIC"       => b1(FilterIsNumeric(_))
      case "ISBLANK" => fail("isBlank is identically false here (the Term" +
        " model has no blank nodes) — outside the subset")
      case "SAMETERM" => b2(FilterSameTerm(_, _))
      case "EXISTS" =>
        PB(FilterExists(groupGraphPattern()))
      case "NOT" =>
        skipWs()
        expectWord("EXISTS")
        PB(FilterNot(FilterExists(groupGraphPattern())))
      case "NOW" | "RAND" | "UUID" | "STRUUID" => fail(
        s"$name is non-deterministic — outside the oracle-gated subset" +
          " by design")
      case "COUNT" | "SUM" | "AVG" | "MIN" | "MAX" | "SAMPLE" |
           "GROUP_CONCAT" => fail(
        s"$name is an aggregate, not an expression leaf — bind it to an" +
          " alias and read the alias in a later select item (§18.2.4.2):" +
          " (MAX(?b) AS ?hi) (?hi - ?lo AS ?range)")
      case "" => fail("expected an expression")
      case other => fail(s"unsupported function $other")
    }
  }

  // -------------------------------------------------------- aggregates

  /** `COUNT(*)` / `FN([DISTINCT] ?v)` / `GROUP_CONCAT(?v; SEPARATOR=s)`
    * → the Agg payload (fn, v, distinct); `as` is bound by the caller. */
  private def aggCall(): Option[(AggFn, Option[V], Boolean)] = {
    val save = i
    skipWs()
    val start = i
    while (i < n && wordChar(doc.charAt(i))) i += 1
    val name = doc.substring(start, i).toUpperCase
    val fn: Option[AggFn] = name match {
      case "COUNT" => Some(AggCount)
      case "SUM"   => Some(AggSum)
      case "AVG"   => Some(AggAvg)
      case "MIN"   => Some(AggMin)
      case "MAX"   => Some(AggMax)
      case "SAMPLE" => Some(AggSample)
      case "GROUP_CONCAT" => Some(AggGroupConcat(" "))
      case _ => None
    }
    if (fn.isEmpty) { i = save; return None }
    skipWs()
    if (peek != '(') { i = save; return None }
    i += 1
    skipWs()
    val distinct = eatWord("DISTINCT")
    skipWs()
    if (name == "COUNT" && peek == '*') {
      i += 1
      expect(')')
      return Some((AggCount, None, distinct))
    }
    val v = if (peek == '?' || peek == '$') parseVar()
      else fail(s"$name aggregates a VARIABLE in this subset (aggregate" +
        " expressions: BIND the expression first)")
    if (distinct && name != "COUNT") fail(
      s"DISTINCT is supported for COUNT only (the engine's documented " +
        s"§11 subset) — got $name(DISTINCT ...)")
    skipWs()
    val f: AggFn =
      if (name == "GROUP_CONCAT" && peek == ';') {
        i += 1; skipWs()
        expectWord("SEPARATOR")
        skipWs(); expect('=')
        AggGroupConcat(constStringArg("GROUP_CONCAT's separator"))
      } else fn.get
    expect(')')
    Some((f, Some(v), distinct))
  }

  // ------------------------------------------------------ graph groups

  /** `{ … }` → pattern rows (the engine's group representation). */
  private def groupGraphPattern(): Seq[PatternRow] = {
    expect('{')
    skipWs()
    if (peekWord("SELECT")) {
      val sub = subSelect()
      expect('}')
      return Seq(sub)
    }
    val rows = mutable.ArrayBuffer.empty[PatternRow]
    skipWs()
    while (peek != '}') {
      if (peekWord("OPTIONAL")) {
        i += 8
        rows += Optional(groupGraphPattern())
      } else if (peekWord("MINUS")) {
        i += 5
        rows += Minus(groupGraphPattern())
      } else if (peekWord("GRAPH")) {
        i += 5
        skipWs()
        val g: TermOrVar =
          if (peek == '?' || peek == '$') parseVar() else T(iriTerm())
        rows ++= GraphScope(g, groupGraphPattern())
      } else if (peekWord("FILTER")) {
        i += 6
        skipWs()
        if (peekWord("NOT")) {
          i += 3; skipWs()
          expectWord("EXISTS")
          rows += NotExists(groupGraphPattern()) // whole-filter canon
        } else if (peekWord("EXISTS")) {
          i += 6
          rows += FilterExists(groupGraphPattern())
        } else if (peek == '(') {
          i += 1
          rows += requireB(expression(), "FILTER")
          expect(')')
        } else rows += requireB(builtInCall(), "FILTER")
      } else if (peekWord("BIND")) {
        i += 4
        expect('(')
        val e = requireT(expression(), "BIND")
        skipWs()
        expectWord("AS")
        val v = parseVar()
        expect(')')
        rows += Bind(e, v)
      } else if (peekWord("VALUES")) {
        i += 6
        rows += inlineData()
      } else if (peekWord("SERVICE")) {
        fail("SERVICE federation is outside the subset")
      } else if (peek == '{') {
        // either a UNION chain or a subquery; a bare nested group is
        // refused (splicing would change its FILTERs' scope)
        val first = groupGraphPattern()
        skipWs()
        if (peekWord("UNION")) {
          val branches = mutable.ArrayBuffer(first)
          while (eatWord("UNION")) branches += groupGraphPattern()
          rows += Union(branches.toSeq)
        } else first match {
          case Seq(ss: SubSelect) => rows += ss
          case _ => fail("a bare nested group is outside the subset — " +
            "its FILTER scoping differs from splicing; use OPTIONAL / " +
            "UNION / GRAPH or a subquery")
        }
      } else {
        triplesSameSubject(rows)
      }
      skipWs()
      if (peek == '.') { i += 1; skipWs() }
    }
    expect('}')
    rows.toSeq
  }

  /** subject (verb objectList)(';' verb objectList)* — verbs may be
    * property paths; each (s, path, o) lowers to the engine's row. */
  private def triplesSameSubject(rows: mutable.ArrayBuffer[PatternRow]): Unit = {
    val s = termOrVar()
    var more = true
    while (more) {
      skipWs()
      val vb = verb()
      var moreObj = true
      while (moreObj) {
        val o = termOrVar()
        rows += (vb match {
          case Left(p)     => TriplePattern(s, p, o)
          case Right(path) => PathPattern(s, path, o)
        })
        skipWs()
        if (peek == ',') { i += 1 } else moreObj = false
      }
      skipWs()
      if (peek == ';') {
        i += 1; skipWs()
        if (peek == '.' || peek == '}' || peek == ';') more = false
      } else more = false
    }
  }

  /** VALUES: the single-var bag form → [[Values]], the table form →
    * [[ValuesTable]] (UNDEF = None). */
  private def inlineData(): PatternRow = {
    skipWs()
    if (peek == '?' || peek == '$') {
      val v = parseVar()
      expect('{')
      val terms = mutable.ArrayBuffer.empty[Term]
      skipWs()
      while (peek != '}') {
        if (peekWord("UNDEF")) fail("UNDEF in the single-variable VALUES" +
          " form binds nothing — use the table form")
        terms += groundTerm()
        skipWs()
      }
      expect('}')
      Values(v, terms.toSeq)
    } else {
      expect('(')
      val vs = mutable.ArrayBuffer(parseVar())
      skipWs()
      while (peek == '?' || peek == '$') { vs += parseVar(); skipWs() }
      expect(')')
      expect('{')
      val rws = mutable.ArrayBuffer.empty[Seq[Option[Term]]]
      skipWs()
      while (peek != '}') {
        expect('(')
        val row = mutable.ArrayBuffer.empty[Option[Term]]
        skipWs()
        while (peek != ')') {
          if (eatWord("UNDEF")) row += None
          else row += Some(groundTerm())
          skipWs()
        }
        expect(')')
        rws += row.toSeq
        skipWs()
      }
      expect('}')
      ValuesTable(vs.toSeq, rws.toSeq)
    }
  }

  // ---------------------------------------------------------- queries

  private def prologue(): Unit = {
    skipWs()
    var go = true
    while (go) {
      if (peekWord("PREFIX")) {
        i += 6
        skipWs()
        val start = i
        while (i < n && doc.charAt(i) != ':' && pnameChar(doc.charAt(i)))
          i += 1
        if (peek != ':') fail("malformed PREFIX declaration")
        val name = doc.substring(start, i)
        i += 1
        prefixes(name) = iriRef()
        skipWs()
      } else if (peekWord("BASE")) {
        fail("BASE / relative-IRI resolution is outside the subset — " +
          "use absolute IRIs")
      } else go = false
    }
  }

  def parseQuery(): SparqlQuery = {
    prologue()
    skipWs()
    val q =
      if (peekWord("SELECT")) selectQuery()
      else if (peekWord("CONSTRUCT")) constructQuery()
      else if (peekWord("ASK")) {
        i += 3
        val ds = datasetClause()
        AskQuery(whereClause(), ds)
      }
      else if (peekWord("DESCRIBE")) describeQuery()
      else fail("expected SELECT, CONSTRUCT, ASK, or DESCRIBE " +
        "(updates run through graft.ops.Update / GraphMgmt, not the " +
        "query grammar)")
    skipWs()
    if (i < n) fail("trailing input after the query")
    q
  }

  private def whereClause(): Seq[PatternRow] = {
    skipWs()
    eatWord("WHERE")
    groupGraphPattern()
  }

  /** `FROM g` / `FROM NAMED g` clauses (§13.2) before WHERE. */
  private def datasetClause(): Option[Dataset] = {
    val dflt = mutable.ArrayBuffer.empty[Term]
    val named = mutable.ArrayBuffer.empty[Term]
    while (peekWord("FROM")) {
      i += 4
      skipWs()
      if (eatWord("NAMED")) named += iriTerm()
      else dflt += iriTerm()
    }
    if (dflt.isEmpty && named.isEmpty) None
    else Some(Dataset(dflt.toSeq, named.toSeq))
  }

  /** SELECT clause items + WHERE + solution modifiers. */
  private def selectQuery(): SelectQuery = {
    expectWord("SELECT")
    skipWs()
    val distinct = eatWord("DISTINCT")
    // REDUCED (§18.2.5.2) PERMITS dropping duplicate solutions but
    // never requires it — the identity is a conforming implementation,
    // so it lowers to a plain SELECT (one-way sugar, never printed
    // back; pinned in SparqlSpec). DISTINCT is the set form.
    if (eatWord("REDUCED") && distinct)
      fail("DISTINCT and REDUCED are mutually exclusive")
    // select items
    var star = false
    val proj = mutable.ArrayBuffer.empty[V]
    val aggs = mutable.ArrayBuffer.empty[Agg]
    val binds = mutable.ArrayBuffer.empty[Bind]
    skipWs()
    if (peek == '*') { i += 1; star = true }
    else {
      var more = true
      while (more) {
        skipWs()
        if (peek == '?' || peek == '$') proj += parseVar()
        else if (peek == '(') {
          i += 1
          aggCall() match {
            case Some((fn, v, d)) =>
              skipWs()
              if (!peekWord("AS")) fail(
                "an aggregate call binds an alias directly — " +
                  "(AGG(?v) AS ?a); an expression OVER aggregates reads " +
                  "the alias in a later item (§18.2.4.2): " +
                  "(MAX(?b) AS ?hi) (?hi - ?lo AS ?range)")
              expectWord("AS")
              val as = parseVar()
              expect(')')
              aggs += Agg(fn, v, as, d)
              proj += as
            case None =>
              val e = requireT(expression(), "a projection expression")
              skipWs(); expectWord("AS")
              val as = parseVar()
              expect(')')
              binds += Bind(e, as) // §18.2.4 Extend desugar
              proj += as
          }
        } else more = false
        skipWs()
        if (peek != '?' && peek != '$' && peek != '(') more = false
      }
      if (proj.isEmpty) fail("SELECT needs at least one item (or *)")
    }
    // §18.2.4.2: with aggregates, expression items become POST-AGG
    // binds (they may read keys, agg aliases, and earlier aliases —
    // SelectQuery validates the written-order scoping); without, they
    // desugar into the WHERE group (§18.2.4 Extend)
    val ds = datasetClause()
    val where0 = whereClause()
    val where = if (aggs.isEmpty) where0 ++ binds else where0
    val postBinds = if (aggs.isEmpty) Nil else binds.toSeq
    // ---- solution modifiers ----
    val groupBy = mutable.ArrayBuffer.empty[(TermExpr, V)]
    skipWs()
    if (eatWord("GROUP")) {
      skipWs(); expectWord("BY")
      var more = true
      while (more) {
        skipWs()
        if (peek == '?' || peek == '$') {
          val v = parseVar()
          groupBy += ((TVar(v), v))
        } else if (peek == '(') {
          i += 1
          val e = requireT(expression(), "GROUP BY")
          skipWs(); expectWord("AS")
          val v = parseVar()
          expect(')')
          groupBy += ((e, v))
        } else more = false
        skipWs()
        if (peek != '?' && peek != '$' && peek != '(') more = false
      }
      if (groupBy.isEmpty) fail("GROUP BY needs at least one key")
    }
    var having: Option[FilterExpr] = None
    skipWs()
    if (eatWord("HAVING")) {
      skipWs()
      having = Some(
        if (peek == '(') { i += 1; val f = requireB(expression(), "HAVING")
          expect(')'); f }
        else requireB(builtInCall(), "HAVING"))
    }
    val orderBy = mutable.ArrayBuffer.empty[(TermExpr, Boolean)]
    skipWs()
    if (eatWord("ORDER")) {
      skipWs(); expectWord("BY")
      var more = true
      while (more) {
        skipWs()
        if (eatWord("ASC")) {
          expect('(')
          orderBy += ((requireT(expression(), "ORDER BY"), true))
          expect(')')
        } else if (eatWord("DESC")) {
          expect('(')
          orderBy += ((requireT(expression(), "ORDER BY"), false))
          expect(')')
        } else if (peek == '?' || peek == '$') {
          orderBy += ((TVar(parseVar()), true))
        } else if (peek == '(') {
          i += 1
          orderBy += ((requireT(expression(), "ORDER BY"), true))
          expect(')')
        } else more = false
        skipWs()
        if (!peekWord("ASC") && !peekWord("DESC") &&
          peek != '?' && peek != '$' && peek != '(') more = false
      }
      if (orderBy.isEmpty) fail("ORDER BY needs at least one key")
    }
    var limit = -1; var offset = 0
    skipWs()
    // LIMIT and OFFSET may come in either order (the SPARQL grammar)
    var modsMore = true
    while (modsMore) {
      skipWs()
      if (eatWord("LIMIT")) {
        skipWs()
        limit = numericLiteral() match {
          case TLong(v) if v >= 0 => v.toInt
          case other => fail(s"LIMIT must be a non-negative integer, got $other")
        }
      } else if (eatWord("OFFSET")) {
        skipWs()
        offset = numericLiteral() match {
          case TLong(v) if v >= 0 => v.toInt
          case other => fail(s"OFFSET must be a non-negative integer, got $other")
        }
      } else modsMore = false
    }
    // the trailing VALUES clause (§18.2.5): the algebra joins it with
    // the query pattern BEFORE Project/Distinct/Slice, so for a
    // non-aggregate query appending it to the group is exact
    // (canonical form — the printer emits VALUES inside the group)
    skipWs()
    val where2 =
      if (peekWord("VALUES")) {
        i += 6
        if (aggs.nonEmpty) fail("a trailing VALUES clause on an " +
          "AGGREGATE query is outside the subset — put the VALUES " +
          "inside the WHERE group")
        where :+ inlineData()
      } else where
    SelectQuery(if (star) Nil else proj.toSeq, where2, aggs.toSeq,
      groupBy.toSeq, having, orderBy.toSeq, limit, offset, distinct,
      postBinds, ds)
  }

  /** `{ SELECT … }` → the [[SubSelect]] row (§12). The AST's subquery
    * takes plain group keys and variable order keys; expression sugar
    * inside a SUBQUERY is outside the subset (loud). */
  private def subSelect(): SubSelect = {
    val q = selectQuery()
    val groupBy = q.groupBy.map {
      case (TVar(v), as) if v.name == as.name => v
      case other => fail(s"GROUP BY expressions inside a subquery are " +
        s"outside the subset (got $other) — BIND the expression in the " +
        "subquery's group")
    }
    val orderBy = q.orderBy.map {
      case (TVar(v), asc) => OrderKey(v, asc)
      case other => fail(s"ORDER BY expressions inside a subquery are " +
        s"outside the subset (got $other)")
    }
    if (q.proj.isEmpty) fail("SELECT * in a subquery is outside the " +
      "subset — project explicitly (§12.4 scoping)")
    if (q.postBinds.nonEmpty) fail("select expressions over aggregate " +
      "aliases inside a SUBQUERY are outside the subset — compute them " +
      "in the enclosing query")
    if (q.dataset.nonEmpty) fail("FROM/FROM NAMED inside a subquery is " +
      "outside the subset (SPARQL scopes dataset clauses to the whole " +
      "query)")
    SubSelect(q.proj, q.where, groupBy, q.aggs, q.having, orderBy,
      q.limit, q.offset, q.distinct)
  }

  private def constructQuery(): ConstructQuery = {
    expectWord("CONSTRUCT")
    skipWs()
    if (peekWord("WHERE") || peekWord("FROM")) {
      // §16.2.1 CONSTRUCT WHERE shorthand: the pattern IS the template
      // (plain triples only — canonical form is the full query, the
      // DELETE WHERE sugar discipline)
      val ds = datasetClause()
      skipWs(); expectWord("WHERE")
      val rows = groupGraphPattern()
      val templates = rows.map {
        case TriplePattern(s, p, o) => (s, p, o)
        case other => fail(s"CONSTRUCT WHERE takes plain triple " +
          s"patterns only (§16.2.1), got $other")
      }
      return ConstructQuery(templates, rows, ds)
    }
    expect('{')
    val rows = mutable.ArrayBuffer.empty[PatternRow]
    skipWs()
    while (peek != '}') {
      triplesSameSubject(rows)
      skipWs()
      if (peek == '.') { i += 1; skipWs() }
    }
    expect('}')
    val templates = rows.toSeq.map {
      case TriplePattern(s, p, o) => (s, p, o)
      case other => fail(s"CONSTRUCT templates are plain triples, got $other")
    }
    val ds = datasetClause()
    ConstructQuery(templates, whereClause(), ds)
  }

  // ----------------------------------------------------------- update

  /** A ';'-separated op sequence, PREFIX declarations legal before
    * each op (the §3 request grammar). */
  def parseUpdateRequest(): Seq[UpdateOp] = {
    val ops = mutable.ArrayBuffer.empty[UpdateOp]
    var go = true
    while (go) {
      prologue()
      skipWs()
      if (i >= n) go = false
      else {
        ops += updateOp()
        skipWs()
        if (peek == ';') { i += 1 } else {
          skipWs()
          if (i < n) fail("expected ';' between update operations")
          go = false
        }
      }
    }
    if (ops.isEmpty) fail("empty update request")
    ops.toSeq
  }

  private def updateOp(): UpdateOp = {
    skipWs()
    if (eatWord("INSERT")) {
      skipWs()
      if (eatWord("DATA")) InsertData(groundQuads())
      else {
        val ins = quadTemplates(groundOnly = false)
        skipWs(); expectWord("WHERE")
        Modify(Nil, ins, groupGraphPattern())
      }
    } else if (eatWord("DELETE")) {
      skipWs()
      if (eatWord("DATA")) DeleteData(groundQuads())
      else if (peekWord("WHERE")) {
        // §3.1.3.2 sugar: the pattern IS the template set — so the
        // WHERE rows must match exactly the quads the templates name.
        // A bare triple pattern is therefore scoped to the DEFAULT
        // graph on BOTH sides (a bare TriplePattern row would match
        // the union of all graphs, letting named-graph bindings
        // delete default-graph facts §3.1.3.2 never names).
        i += 5
        val dg = T(graft.core.QuadDb.DefaultGraph): TermOrVar
        val scoped = groupGraphPattern().map {
          case TriplePattern(s, p, o)  => QuadPattern(s, p, o, dg)
          case q @ QuadPattern(_, _, _, _) => q
          case other => fail(s"DELETE WHERE takes plain (quad) triple " +
            s"patterns only, got $other")
        }
        val ts = scoped.map { case QuadPattern(s, p, o, g) => (s, p, o, g) }
        Modify(ts, Nil, scoped)
      } else {
        val del = quadTemplates(groundOnly = false)
        skipWs()
        val ins =
          if (eatWord("INSERT")) quadTemplates(groundOnly = false) else Nil
        skipWs(); expectWord("WHERE")
        Modify(del, ins, groupGraphPattern())
      }
    } else if (eatWord("LOAD")) {
      skipWs()
      val silent = eatWord("SILENT")
      skipWs()
      val doc = iriRef()
      val file =
        if (doc.startsWith("file://")) doc.substring(7)
        else if (doc.startsWith("file:")) doc.substring(5)
        else doc
      skipWs()
      val g = if (eatWord("INTO")) {
        skipWs(); expectWord("GRAPH")
        groundTerm()
      } else graft.core.QuadDb.DefaultGraph
      LoadOp(file, g, silent)
    } else if (peekWord("CLEAR") || peekWord("DROP")) {
      if (!eatWord("CLEAR")) expectWord("DROP") // ≡ here (no containers)
      skipWs(); eatWord("SILENT")
      skipWs()
      if (eatWord("ALL")) ClearOp(None)
      else if (eatWord("DEFAULT")) ClearOp(Some(graft.core.QuadDb.DefaultGraph))
      else if (eatWord("NAMED")) ClearNamedOp
      else { skipWs(); expectWord("GRAPH"); ClearOp(Some(groundTerm())) }
    } else if (peekWord("COPY") || peekWord("MOVE") || peekWord("ADD")) {
      val kind = if (eatWord("COPY")) "copy"
        else if (eatWord("MOVE")) "move" else { expectWord("ADD"); "add" }
      skipWs(); eatWord("SILENT")
      val from = graphOrDefault()
      skipWs(); expectWord("TO")
      val to = graphOrDefault()
      kind match {
        case "copy" => CopyOp(from, to)
        case "move" => MoveOp(from, to)
        case _      => AddOp(from, to)
      }
    } else if (eatWord("CREATE")) {
      skipWs()
      val silent = eatWord("SILENT")
      skipWs(); expectWord("GRAPH")
      CreateOp(groundTerm(), silent)
    } else fail("expected an update operation (INSERT/DELETE/LOAD/CLEAR/" +
      "DROP/COPY/MOVE/ADD/CREATE)")
  }

  private def graphOrDefault(): Term = {
    skipWs()
    if (eatWord("DEFAULT")) graft.core.QuadDb.DefaultGraph
    else { eatWord("GRAPH"); groundTerm() }
  }

  /** `{ quads }` as TEMPLATES: triples + `GRAPH gOrVar { triples }`
    * blocks; bare triples land in the default graph. Paths / filters /
    * anything non-triple refuse loudly. */
  private def quadTemplates(groundOnly: Boolean)
      : Seq[(TermOrVar, TermOrVar, TermOrVar, TermOrVar)] = {
    skipWs()
    expect('{')
    val out =
      mutable.ArrayBuffer.empty[(TermOrVar, TermOrVar, TermOrVar, TermOrVar)]
    def triplesInto(g: TermOrVar): Unit = {
      val rows = mutable.ArrayBuffer.empty[PatternRow]
      triplesSameSubject(rows)
      rows.foreach {
        case TriplePattern(s, p, o) =>
          if (groundOnly)
            for (x <- Seq(s, p, o, g) if x.isInstanceOf[V])
              fail("INSERT/DELETE DATA takes GROUND quads — a variable " +
                "needs the WHERE forms")
          out += ((s, p, o, g))
        case other => fail(s"templates are plain triples, got $other")
      }
    }
    skipWs()
    while (peek != '}') {
      if (peekWord("GRAPH")) {
        i += 5
        skipWs()
        val g: TermOrVar =
          if (!groundOnly && (peek == '?' || peek == '$')) parseVar()
          else T(groundTerm())
        skipWs()
        expect('{')
        skipWs()
        while (peek != '}') {
          triplesInto(g)
          skipWs()
          if (peek == '.') { i += 1; skipWs() }
        }
        expect('}')
      } else triplesInto(T(graft.core.QuadDb.DefaultGraph))
      skipWs()
      if (peek == '.') { i += 1; skipWs() }
    }
    expect('}')
    if (out.isEmpty) fail("empty template/data block")
    out.toSeq
  }

  private def groundQuads(): Seq[(Term, Term, Term, Term)] =
    quadTemplates(groundOnly = true).map {
      case (T(s), T(p), T(o), T(g)) => (s, p, o, g)
      case other => fail(s"unreachable non-ground data quad: $other")
    }

  private def describeQuery(): DescribeQuery = {
    expectWord("DESCRIBE")
    skipWs()
    if (peek == '?' || peek == '$') {
      val v = parseVar()
      val ds = datasetClause()
      DescribeQuery(v, whereClause(), ds)
    } else {
      // DESCRIBE <iri> [WHERE {…}] ≡ DESCRIBE ?d WHERE { … VALUES ?d {<iri>} }
      val t = groundTerm()
      freshN += 1
      val v = V(s"__desc$freshN")
      val ds = datasetClause()
      skipWs()
      val base = if (peekWord("WHERE") || peek == '{') whereClause() else Nil
      DescribeQuery(v, base :+ Values(v, Seq(t)), ds)
    }
  }
}
