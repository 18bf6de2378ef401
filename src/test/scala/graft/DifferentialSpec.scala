package graft

import graft.core.{Term, TripleDb}
import graft.core.Term._
import graft.dsl._
import graft.engine.{BgpCompiler, Projections}
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Differential fuzzing: an independent in-memory interpreter of the
  * engine's documented semantics (SURVEY §2.3 left-join optional model,
  * membero values, bag conjunction) is compared against the Spark
  * engine on random small databases and random queries. Catches
  * Spark-substrate bugs (join/null/codegen handling) that golden tests
  * with hand-picked data would miss.
  */
object MiniInterp {
  /** A solution row: var → value; null = unbound (SQL NULL). */
  type Row = Map[String, Term]
  /** Result = (column set, rows). Columns matter: a var can be present
    * and unbound, or absent entirely. */
  case class Rel(cols: Set[String], rows: Seq[Row])

  private def unifyPairs(pairs: Seq[(TermOrVar, Term)],
                         row: Row): Option[Row] =
    pairs.foldLeft(Option(row)) {
      case (None, _) => None
      case (Some(b), (T(t), v)) => if (t == v) Some(b) else None
      case (Some(b), (V(n), v)) => b.get(n) match {
        case Some(null) => None // engine joins on columns; null never matches
        case Some(x)    => if (x == v) Some(b) else None
        case None       => Some(b + (n -> v))
      }
    }

  private def unifyPattern(quad: (Term, Term, Term, Term), pat: PatternRow,
                           row: Row): Option[Row] = pat match {
    case TriplePattern(s, p, o) =>
      unifyPairs(Seq(s -> quad._1, p -> quad._2, o -> quad._3), row)
    case QuadPattern(s, p, o, g) =>
      unifyPairs(Seq(s -> quad._1, p -> quad._2, o -> quad._3, g -> quad._4),
        row)
    case other => throw new IllegalArgumentException(s"not a pattern: $other")
  }

  /** Three-valued comparison: None = SPARQL type error (unbound side
    * or incomparable families). */
  private def cmpTerm(a: Term, op: CmpOp, t: Term): Option[Boolean] = {
    def c(x: Int): Boolean = op match {
      case Lt => x < 0; case Le => x <= 0; case Gt => x > 0
      case Ge => x >= 0; case Neq => x != 0; case Eq => x == 0
    }
    (a, t) match {
      case (null, _) | (_, null)    => None
      case (TLong(x), TLong(y))     => Some(c(x.compare(y))) // exact int64
      case (TLong(x), TDouble(y))   => Some(c(x.toDouble.compare(y)))
      case (TDouble(x), TLong(y))   => Some(c(x.compare(y.toDouble)))
      case (TDouble(x), TDouble(y)) => Some(c(x.compare(y)))
      case (TString(x), TString(y)) => Some(c(x.compareTo(y)))
      case (TDate(x), TDate(y))     => Some(c(x.compareTo(y)))
      case _                        => None
    }
  }

  /** [[TermExpr]] evaluation — None = error (unbound/out-of-domain
    * operand, exact-zero divisor). Mirrors the engine's promotion
    * (long op long exact int64 with wrap, ÷ always double) and the
    * §17.4 function domains documented on the DSL nodes. */
  private def evalNum(e: TermExpr, b: Row,
                      db: Seq[(Term, Term, Term, Term)]): Option[Term] = {
    def num(t: Term): Double = t match {
      case TLong(x) => x.toDouble; case TDouble(d) => d
      case other => sys.error(s"not numeric: $other")
    }
    def asStrKind(t: Term): Option[(String, Option[String])] = t match {
      case TString(s)          => Some((s, None))
      case TLangString(s, lg)  => Some((s, Some(lg)))
      case _                   => None
    }
    def reStr(lex: String, lang: Option[String]): Term =
      lang.map(TLangString(lex, _)).getOrElse(TString(lex))
    e match {
      case NVar(v) => b.getOrElse(v.name, null) match {
        case t @ (TLong(_) | TDouble(_)) => Some(t)
        case _ => None
      }
      case NConst(t) => Some(t)
      case NDiv(x, y) =>
        for (a <- evalNum(x, b, db); c <- evalNum(y, b, db) if num(c) != 0.0)
          yield TDouble(num(a) / num(c))
      case op2: NumExpr =>
        val (x, y) = op2 match {
          case NAdd(p, q) => (p, q); case NSub(p, q) => (p, q)
          case NMul(p, q) => (p, q)
          case other => sys.error(s"not an op: $other")
        }
        def opL(p: Long, q: Long): Long = op2 match {
          case _: NAdd => p + q; case _: NSub => p - q; case _ => p * q
        }
        def opD(p: Double, q: Double): Double = op2 match {
          case _: NAdd => p + q; case _: NSub => p - q; case _ => p * q
        }
        for (a <- evalNum(x, b, db); c <- evalNum(y, b, db)) yield (a, c) match {
          case (TLong(p), TLong(q)) => TLong(opL(p, q))
          case _ => TDouble(opD(num(a), num(c)))
        }
      case TVar(v)   => Option(b.getOrElse(v.name, null))
      case TConst(t) => Some(t)
      case TStr(x) => evalNum(x, b, db).flatMap {
        case TString(s)         => Some(TString(s))
        case TLangString(s, _)  => Some(TString(s))
        case TTyped(s, _)       => Some(TString(s))
        case TLong(v)           => Some(TString(v.toString))
        case TDate(iso)         => Some(TString(iso))
        case TKeyword(n)        => Some(TString(n))
        case TUri(u)            => Some(TString(u))
        case _                  => None
      }
      case TLang(x) => evalNum(x, b, db).flatMap {
        case TLangString(_, lg) => Some(TString(lg))
        case TString(_) | TTyped(_, _) | TLong(_) | TDouble(_) |
             TBool(_) | TDate(_) => Some(TString(""))
        case _ => None
      }
      case TDatatype(x) =>
        val xsd = "http://www.w3.org/2001/XMLSchema#"
        evalNum(x, b, db).flatMap {
          case TString(_)     => Some(TUri(xsd + "string"))
          case TLangString(_, _) => Some(TUri(
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"))
          case TTyped(_, dt)  => Some(TUri(dt))
          case TLong(_)       => Some(TUri(xsd + "integer"))
          case TDouble(_)     => Some(TUri(xsd + "double"))
          case TBool(_)       => Some(TUri(xsd + "boolean"))
          case TDate(_)       => Some(TUri(xsd + "date"))
          case _              => None
        }
      case TStrlen(x) =>
        evalNum(x, b, db).flatMap(asStrKind).map(p => TLong(p._1.length.toLong))
      case TSubstr(x, start, len) =>
        evalNum(x, b, db).flatMap(asStrKind).map { case (s, lg) =>
          val from = math.min(start - 1, s.length)
          val sub = len match {
            case Some(n) => s.substring(from, math.min(from + n, s.length))
            case None    => s.substring(from)
          }
          reStr(sub, lg)
        }
      case TUcase(x) =>
        evalNum(x, b, db).flatMap(asStrKind)
          .map { case (s, lg) => reStr(s.toUpperCase, lg) }
      case TLcase(x) =>
        evalNum(x, b, db).flatMap(asStrKind)
          .map { case (s, lg) => reStr(s.toLowerCase, lg) }
      case TReplace(x, p, rep) =>
        evalNum(x, b, db).flatMap(asStrKind)
          .map { case (s, lg) => reStr(s.replaceAll(p, rep), lg) }
      case TStrLang(x, lang) => evalNum(x, b, db).flatMap {
        case TString(s) => Some(TLangString(s, lang))
        case _          => None // incl. already-tagged strings, per spec
      }
      case TStrDt(x, dt) => evalNum(x, b, db).flatMap {
        case TString(s) => Some(TTyped(s, dt))
        case _          => None
      }
      case ba @ (TStrBefore(_, _) | TStrAfter(_, _)) =>
        val (x, nd, isBefore) = ba match {
          case TStrBefore(a1, b1) => (a1, b1, true)
          case TStrAfter(a1, b1)  => (a1, b1, false)
          case other => sys.error(s"unreachable: $other")
        }
        (evalNum(x, b, db).flatMap(asStrKind), evalNum(nd, b, db)) match {
          case (Some((s, lg)), Some(TString(n))) =>
            val i = s.indexOf(n) // "" matches at 0 — the spec rule
            Some(
              if (i < 0) TString("") // a MISS is the PLAIN empty string
              else reStr(
                if (isBefore) s.substring(0, i)
                else s.substring(i + n.length), lg))
          case _ => None
        }
      case TConcat(es) =>
        val vs = es.map(x => evalNum(x, b, db))
        if (vs.forall(_.exists(_.isInstanceOf[TString])))
          Some(TString(vs.flatten.collect { case TString(s) => s }.mkString))
        else None
      case num @ (TAbs(_) | TRound(_) | TCeil(_) | TFloor(_)) =>
        val x = num match {
          case TAbs(e0) => e0; case TRound(e0) => e0
          case TCeil(e0) => e0; case TFloor(e0) => e0
          case other => sys.error(s"unreachable: $other")
        }
        evalNum(x, b, db).flatMap {
          case TLong(v) => Some(num match {
            case _: TAbs => TLong(math.abs(v)); case _ => TLong(v)
          })
          case TDouble(d) => Some(TDouble(num match {
            case _: TAbs   => math.abs(d)
            case _: TRound => math.floor(d + 0.5) // fn:round, ties to +inf
            case _: TCeil  => math.ceil(d)
            case _: TFloor => math.floor(d)
            case other => sys.error(s"unreachable: $other")
          }))
          case _ => None
        }
      case TDatePart(x, field) =>
        // the SPEC of the deterministic subset: the component IS the
        // corresponding field of the canonical ISO lexical — the model
        // parses by regex GROUPS (not the engine's fixed positions)
        val DateRe =
          """(\d{4})-(\d{2})-(\d{2})(?:T(\d{2}):(\d{2}):(\d{2}))?.*""".r
        evalNum(x, b, db).flatMap {
          case TDate(DateRe(y, mo, d, h, mi, s)) =>
            val g = field match {
              case DfYear => y; case DfMonth => mo; case DfDay => d
              case DfHours => h; case DfMinutes => mi; case DfSeconds => s
            }
            Option(g).map(v => TLong(v.toLong))
          case _ => None
        }
      case TTz(x) => evalNum(x, b, db).flatMap {
        case TDate(iso) if iso.matches("""\d{4}-\d{2}-\d{2}.*""") =>
          Some(TString(
            if (iso.endsWith("Z")) "Z"
            else if (iso.matches(""".*[+-]\d{2}:\d{2}""")) iso.takeRight(6)
            else ""))
        case _ => None
      }
      case TTimezone(x) =>
        // the SPEC: parse the designator by regex GROUPS and build the
        // XSD canonical dayTimeDuration from the integer components —
        // never the engine's fixed-position substring formulation
        val OffRe = """.*([+-])(\d{2}):(\d{2})$""".r
        evalNum(x, b, db).flatMap {
          case TDate(iso) if iso.matches("""\d{4}-\d{2}-\d{2}.*""") =>
            val dtd = "http://www.w3.org/2001/XMLSchema#dayTimeDuration"
            if (iso.endsWith("Z")) Some(TTyped("PT0S", dtd))
            else iso match {
              case OffRe(sg, hh, mm) =>
                val h = hh.toInt; val m = mm.toInt
                val body =
                  if (h == 0 && m == 0) "PT0S"
                  else "PT" + (if (h > 0) s"${h}H" else "") +
                    (if (m > 0) s"${m}M" else "")
                val sign = if (sg == "-" && (h > 0 || m > 0)) "-" else ""
                Some(TTyped(sign + body, dtd))
              case _ => None // no designator: ERROR per §17.4.5.7
            }
          case _ => None
        }
      case TIri(x) => evalNum(x, b, db).flatMap {
        case u: TUri    => Some(u)
        case TString(s) => Some(TUri(s))
        case _          => None
      }
      case TEncodeForUri(x) => evalNum(x, b, db).flatMap {
        case TString(s) =>
          // fn:encode-for-uri per spec: unreserved passes, every other
          // codepoint's UTF-8 bytes become uppercase %XX
          val sb = new StringBuilder
          s.codePoints().forEach { cp =>
            val cs = new String(Character.toChars(cp))
            if (cs.matches("[A-Za-z0-9._~-]")) sb.append(cs)
            else for (byte <- cs.getBytes("UTF-8"))
              sb.append(f"%%${byte & 0xff}%02X")
          }
          Some(TString(sb.toString))
        case _ => None
      }
      case TBNode(x) => evalNum(x, b, db).flatMap {
        case TString(s) => Some(TUri("urn:graft:bnode/query/" + s))
        case _          => None
      }
      case THash(x, algo) => evalNum(x, b, db).flatMap {
        case TString(s) =>
          val md = java.security.MessageDigest.getInstance(
            if (algo == "md5") "MD5" else "SHA-256")
          Some(TString(md.digest(s.getBytes("UTF-8"))
            .map(bt => f"${bt & 0xff}%02x").mkString))
        case _ => None
      }
      case TIf(cond, t, f) => evalFilter(cond, b, db) match {
        case Some(true)  => evalNum(t, b, db)
        case Some(false) => evalNum(f, b, db)
        case None        => None
      }
      case TCoalesce(es) =>
        es.iterator.map(x => evalNum(x, b, db)).collectFirst {
          case Some(t) => t
        }
    }
  }

  /** [[FilterExpr]] evaluation against one solution row — SPARQL
    * §17.2 three-valued semantics, the independent model the Spark
    * engine's SQL-NULL formulation is checked against. */
  private def evalFilter(f: FilterExpr, b: Row,
                         db: Seq[(Term, Term, Term, Term)]): Option[Boolean] = f match {
    case FilterCmp(v, op, t) => cmpTerm(b.getOrElse(v.name, null), op, t)
    case FilterArith(x, op, y) =>
      (evalNum(x, b, db), evalNum(y, b, db)) match {
        case (Some(a), Some(c)) => cmpTerm(a, op, c)
        case _ => None
      }
    case FilterVarCmp(x, op, y) =>
      cmpTerm(b.getOrElse(x.name, null), op, b.getOrElse(y.name, null))
    case FilterBound(v) => Some(b.getOrElse(v.name, null) != null)
    case FilterIsIri(e) => evalNum(e, b, db).map(t =>
      t.isInstanceOf[TUri] || t.isInstanceOf[TKeyword])
    case FilterIsLiteral(e) => evalNum(e, b, db).map {
      case TString(_) | TLangString(_, _) | TTyped(_, _) | TLong(_) |
           TDouble(_) | TBool(_) | TDate(_) => true
      case _ => false
    }
    case FilterIsNumeric(e) => evalNum(e, b, db).map(t =>
      t.isInstanceOf[TLong] || t.isInstanceOf[TDouble])
    case FilterSameTerm(x, y) =>
      (evalNum(x, b, db), evalNum(y, b, db)) match {
        case (Some(a), Some(c)) => Some(a == c) // term identity, no promotion
        case _ => None
      }
    case FilterLangMatches(e, range) => evalNum(e, b, db).flatMap {
      // RFC 4647 basic filtering per the SPEC: case-insensitive;
      // "*" matches any non-empty tag; a range matches a tag when it
      // equals it or prefixes it at a subtag ('-') boundary
      case TString(tag) =>
        val t = tag.toLowerCase; val r = range.toLowerCase
        Some(
          if (range == "*") t.nonEmpty
          else t == r || t.startsWith(r + "-"))
      case _ => None
    }
    case FilterStrStarts(e, p) => evalStr2(e, p, b, db)(_.startsWith(_))
    case FilterStrEnds(e, p)   => evalStr2(e, p, b, db)(_.endsWith(_))
    case FilterContains(e, p)  => evalStr2(e, p, b, db)(_.contains(_))
    case FilterExists(rows) =>
      // §10.2-compatible existence: never errors; a shared var unbound
      // on either side constrains nothing
      val inner = solveQuads(db, rows)
      Some(inner.rows.exists(ir => inner.cols.forall { c =>
        val x = b.getOrElse(c, null); val y = ir.getOrElse(c, null)
        x == null || y == null || x == y
      }))
    case FilterRegex(v, p, fl) => b.getOrElse(v.name, null) match {
      // the SPEC (fn:matches): compile with flag CONSTANTS, not the
      // engine's inline-prefix lowering — independent formulation
      case TString(s) =>
        val f = fl.foldLeft(0) { (acc, c) => acc | (c match {
          case 'i' => java.util.regex.Pattern.CASE_INSENSITIVE
          case 's' => java.util.regex.Pattern.DOTALL
          case 'm' => java.util.regex.Pattern.MULTILINE
        }) }
        Some(java.util.regex.Pattern.compile(p, f).matcher(s).find())
      case _ => None
    }
    case FilterAnd(es) =>
      val vs = es.map(evalFilter(_, b, db))
      if (vs.contains(Some(false))) Some(false)
      else if (vs.contains(None)) None else Some(true)
    case FilterOr(es) =>
      val vs = es.map(evalFilter(_, b, db))
      if (vs.contains(Some(true))) Some(true)
      else if (vs.contains(None)) None else Some(false)
    case FilterNot(e) => evalFilter(e, b, db).map(!_)
  }

  /** STRSTARTS/STRENDS/CONTAINS domain: arg1 string or lang-string,
    * arg2 a plain string — else error (mirrors the engine). */
  private def evalStr2(e: TermExpr, arg: TermExpr, b: Row,
      db: Seq[(Term, Term, Term, Term)])(
      p: (String, String) => Boolean): Option[Boolean] =
    (evalNum(e, b, db), evalNum(arg, b, db)) match {
      case (Some(TString(a)), Some(TString(x)))        => Some(p(a, x))
      case (Some(TLangString(a, _)), Some(TString(x))) => Some(p(a, x))
      case _                                           => None
    }

  private def closeSet(e: Set[(Term, Term)]): Set[(Term, Term)] = {
    var all = e
    var grew = true
    while (grew) {
      val next = for ((a, b) <- all; (c, d) <- e if b == c) yield (a, d)
      grew = !(next -- all).isEmpty
      all = all ++ next
    }
    all
  }

  /** Distinct pair relation of a path element over the given quads
    * (graph position ignored — union-of-graphs, like the engine's
    * plain PathPattern). Direct recursive evaluation of the algebra —
    * independently of the engine's pushInv/frontier machinery. */
  private def pathPairs(db: Seq[(Term, Term, Term, Term)],
                        pe: PathExpr): Set[(Term, Term)] = {
    def edges(preds: Seq[Term]): Set[(Term, Term)] =
      db.collect { case (s, p, o, _) if preds.contains(p) => (s, o) }.toSet
    def nodeSelf: Set[(Term, Term)] =
      db.flatMap(q => Seq(q._1, q._3)).toSet.map((n: Term) => (n, n))
    pe match {
      case PathPred(p)     => edges(Seq(p))
      case PathNeg(ex)     =>
        db.collect { case (s, p, o, _) if !ex.contains(p) => (s, o) }.toSet
      case PathPlus(p)     => closeSet(edges(Seq(p)))
      case PathAltPlus(ps) => closeSet(edges(ps))
      case PathInv(x)      => pathPairs(db, x).map(_.swap)
      case PathSeq(steps)  => steps.map(pathPairs(db, _)).reduce { (a, b) =>
        for ((x, y) <- a; (y2, z) <- b if y == y2) yield (x, z)
      }
      case PathAlt(alts)   => alts.map(pathPairs(db, _)).reduce(_ ++ _)
      case PathPlusOf(x)   => closeSet(pathPairs(db, x))
      case PathStar(x)     => nodeSelf ++ closeSet(pathPairs(db, x))
      case PathOpt(x)      => nodeSelf ++ pathPairs(db, x)
      case PathRange(x, n, m) =>
        val r = pathPairs(db, x)
        var cur = r
        var acc: Set[(Term, Term)] = if (n <= 1) r else Set.empty
        for (k <- 2 to m) {
          cur = for ((a, b1) <- cur; (c, d) <- r if b1 == c) yield (a, d)
          if (k >= n) acc = acc ++ cur
        }
        if (n == 0) acc ++ nodeSelf else acc
    }
  }

  /** Graph-scoped path solutions: (src, dst, graph) where the WHOLE
    * walk stays inside one graph — evaluated the naive way, one graph
    * at a time, as the semantic reference for the engine's one-pass
    * composite-key form. */
  private def scopedPathTriples(db: Seq[(Term, Term, Term, Term)],
                                pe: PathExpr): Set[(Term, Term, Term)] =
    db.map(_._4).distinct.toSet.flatMap { (g: Term) =>
      pathPairs(db.filter(_._4 == g), pe).map(pr => (pr._1, pr._2, g))
    }

  def solve(db: Seq[(Term, Term, Term)], rows: Seq[PatternRow]): Rel =
    solveQuads(db.map(t => (t._1, t._2, t._3, Term.TNil)), rows)

  def solveQuads(db: Seq[(Term, Term, Term, Term)],
                 rows: Seq[PatternRow]): Rel = {
    val patterns: Seq[PatternRow] =
      rows.collect { case p: TriplePattern => p; case q: QuadPattern => q }
    val paths = rows.collect { case p: PathPattern => p }
    val qpaths = rows.collect { case p: QuadPathPattern => p }
    val values = rows.collect { case v: Values => v }
    val optionals = rows.collect { case o: Optional => o }
    val negations: Seq[PatternRow] =
      rows.collect { case n: NotExists => n; case m: Minus => m }
    val filters: Seq[FilterExpr] = rows.collect { case f: FilterExpr => f }
    val requiredVarNames = Bgp.requiredVars(rows).map(_.name).toSet

    // required conjunction: fold of natural joins (order-independent on
    // deduped facts), then values as filter-or-generator
    var acc = Rel(Set.empty, Seq(Map.empty))
    for (pat <- patterns) {
      val newRows = acc.rows.flatMap(b => db.flatMap(t => unifyPattern(t, pat, b)))
      acc = Rel(acc.cols ++ pat.vars.map(_.name), newRows)
    }
    // property paths: natural join against the DISTINCT pair relation
    for (pp <- paths) {
      val pairs = pathPairs(db, pp.path)
      val newRows = acc.rows.flatMap(b => pairs.toSeq.flatMap(pr =>
        unifyPairs(Seq(pp.s -> pr._1, pp.o -> pr._2), b)))
      acc = Rel(acc.cols ++ pp.vars.map(_.name), newRows)
    }
    // graph-scoped paths: join against the per-graph (src, dst, g) set
    for (qp <- qpaths) {
      val trips = scopedPathTriples(db, qp.path)
      val newRows = acc.rows.flatMap(b => trips.toSeq.flatMap(tr =>
        unifyPairs(Seq(qp.s -> tr._1, qp.o -> tr._2, qp.g -> tr._3), b)))
      acc = Rel(acc.cols ++ qp.vars.map(_.name), newRows)
    }
    // UNION (SPARQL §7): the MULTISET union of the branch solutions
    // (each branch solved independently; a var a branch never binds is
    // UNBOUND there), joined in by §10.2 compatibility with the
    // defined value winning the merge — the spec's Join over
    // incompatible-schema multisets, NOT the engine's pad-and-coalesce
    // formulation
    for (u <- rows.collect { case x: Union => x }) {
      val rels = u.branches.map(b => solveQuads(db, b))
      val uCols = rels.flatMap(_.cols).toSet
      val uRows = rels.flatMap(r => r.rows.map(row =>
        uCols.map(c => c -> row.getOrElse(c, null)).toMap))
      val shared = acc.cols intersect uCols
      val newRows = acc.rows.flatMap { b =>
        uRows.flatMap { ur =>
          val agree = shared.forall { c =>
            val x = b.getOrElse(c, null); val y = ur.getOrElse(c, null)
            x == null || y == null || x == y
          }
          if (!agree) None
          else Some(b ++ uCols.map(c =>
            c -> (if (ur(c) != null) ur(c) else b.getOrElse(c, null))))
        }
      }
      acc = Rel(acc.cols ++ uCols, newRows)
    }
    for (v <- values) {
      val name = v.v.name
      val newRows =
        if (acc.cols.contains(name))
          // membero: a solution with the var UNBOUND generates one row
          // per element (l/membero on a fresh var); bound rows filter
          acc.rows.flatMap { b =>
            if (b.getOrElse(name, null) == null)
              v.coll.toSeq.map(t => b + (name -> t))
            else v.coll.toSeq.filter(_ == b(name)).map(_ => b)
          }
        else acc.rows.flatMap(b => v.coll.toSeq.map(t => b + (name -> t)))
      acc = Rel(acc.cols + name, newRows)
    }
    // multi-var VALUES tables (required fold, like the engine):
    // SPARQL §10.2 solution compatibility — agree on every var bound
    // on BOTH sides; an UNDEF cell or an UNBOUND (null) solution var
    // constrains nothing; the merged row takes the DEFINED value from
    // either side; duplicate table rows multiply (bag semantics)
    for (vt <- rows.collect { case v: ValuesTable => v }) {
      val newRows = acc.rows.flatMap { b =>
        vt.rows.flatMap { tr =>
          vt.vs.map(_.name).zip(tr).foldLeft(Option(b)) {
            case (None, _) => None
            case (Some(m), (n, cell)) =>
              if (acc.cols.contains(n)) (m.getOrElse(n, null), cell) match {
                case (null, Some(t)) => Some(m + (n -> t)) // merge the cell
                case (x, Some(t))    => if (x == t) Some(m) else None
                case (_, None)       => Some(m) // UNDEF constrains nothing
              } else Some(m + (n -> cell.orNull))
          }
        }
      }
      acc = Rel(acc.cols ++ vt.vs.map(_.name), newRows)
    }
    // negation: remove required solutions COMPATIBLE (§10.2: shared
    // vars bound on both sides must agree; an unbound side constrains
    // nothing) with some inner solution; MINUS additionally requires
    // a non-empty bound-domain overlap (§8.2's dom-disjoint rule —
    // per SOLUTION, not per schema: a row whose only shared var is
    // unbound on either side is dom-disjoint and survives)
    for (neg <- negations) {
      val (innerRows, isMinus) = neg match {
        case n: NotExists => (n.rows, false)
        case m: Minus     => (m.rows, true)
        case other => throw new IllegalArgumentException(s"not negation: $other")
      }
      val inner = solveQuads(db, innerRows)
      val shared = acc.cols intersect inner.cols
      def compatible(b: Row): Boolean = inner.rows.exists { ir =>
        val agree = shared.forall { c =>
          val x = b.getOrElse(c, null); val y = ir.getOrElse(c, null)
          x == null || y == null || x == y
        }
        val domOverlap = shared.exists(c =>
          b.getOrElse(c, null) != null && ir.getOrElse(c, null) != null)
        agree && (!isMinus || domOverlap)
      }
      acc =
        if (shared.isEmpty) {
          if (isMinus) acc // SPARQL dom-disjoint: nothing removed
          else if (inner.rows.nonEmpty) Rel(acc.cols, Seq.empty)
          else acc
        } else Rel(acc.cols, acc.rows.filterNot(compatible))
    }

    val noRequired = patterns.isEmpty && values.isEmpty && paths.isEmpty &&
      qpaths.isEmpty && !rows.exists(r => r.isInstanceOf[ValuesTable] ||
        r.isInstanceOf[Union]) // a UNION is a required group member
    if (noRequired) acc = Rel(Set.empty, Seq(Map.empty))

    // optionals: left join per clause on keys = clauseCols ∩ required ∩
    // acc, under §10.2 COMPATIBILITY (an unbound side of a key
    // constrains nothing; the merged row takes whichever side is
    // bound). Shared non-key vars coalesce (same-var alternatives);
    // match markers support the optional-only rule. FILTERs written
    // inside the optional that reference vars the clause cannot bind
    // become the LeftJoin CONDITION, evaluated per MERGED row (SPARQL
    // §18.2.2.2's LeftJoin(P1, P2, F)) — a false/error merge keeps the
    // required row bare, it never empties the clause for every row.
    var markers = Vector.empty[String]
    for ((opt, i) <- optionals.zipWithIndex) {
      val m = s"__m_$i"
      markers :+= m
      val clauseVars = Bgp.allVars(opt.rows.filterNot(_.isInstanceOf[FilterExpr]))
        .map(_.name).toSet
      val (outerFilters, innerRows) = opt.rows.partition {
        case f: FilterExpr => !f.refs.forall(v => clauseVars.contains(v.name))
        case _             => false
      }
      val clause0 = solveQuads(db, innerRows)
      val clause = Rel(clause0.cols + m,
        clause0.rows.map(_ + (m -> TBool(true))))
      val keys = clause.cols.intersect(requiredVarNames).intersect(acc.cols)
      def merged(b: Row, c: Row): Row =
        (acc.cols ++ clause.cols).map { n =>
          val bv = b.getOrElse(n, null)
          n -> (if (bv != null) bv else c.getOrElse(n, null))
        }.toMap
      val joined = acc.rows.flatMap { b =>
        val matches = clause.rows
          .filter(c => keys.forall { k =>
            val x = b.getOrElse(k, null); val y = c.getOrElse(k, null)
            x == null || y == null || x == y
          })
          .map(c => merged(b, c))
          .filter(mr => outerFilters.forall {
            case f: FilterExpr => evalFilter(f, mr, db).contains(true)
            case _             => true
          })
        if (matches.isEmpty)
          Seq((acc.cols ++ clause.cols)
            .map(n => n -> b.getOrElse(n, null)).toMap)
        else matches
      }
      acc = Rel(acc.cols ++ clause.cols, joined)
    }
    if (noRequired && optionals.nonEmpty)
      acc = Rel(acc.cols, acc.rows.filter(r => markers.exists(m => r.getOrElse(m, null) != null)))

    // BIND: extend after the optional fold, before filters (written
    // order; errors leave the var unbound, the row stays)
    for (bd <- rows.collect { case b: Bind => b })
      acc = Rel(acc.cols + bd.as.name,
        acc.rows.map(r => r + (bd.as.name -> evalNum(bd.expr, r, db).orNull)))

    // value filters run AFTER the group's optional fold (SPARQL §18.5
    // evaluation order): per-row three-valued evaluation, only TRUE
    // keeps the row (errors — unbound/cross-family — drop it)
    for (f <- filters)
      acc = Rel(acc.cols, acc.rows.filter(b => evalFilter(f, b, db) == Some(true)))

    Rel(acc.cols -- markers, acc.rows.map(_ -- markers))
  }
}

object DifferentialProps extends Properties("differential") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  lazy val spark = TestSpark.session

  private val subjects = Seq(TKeyword("a"), TKeyword("b"), TKeyword("c"))
  private val preds = Seq(TKeyword("p"), TKeyword("q"), TKeyword("r"))
  // every unification-relevant term shape: strings, longs, keywords,
  // matchable nil, doubles, and opaque host values (byte equality)
  private val objs = Seq[Term](TString("x"), TString("y"), TLong(1),
    TKeyword("a"), TNil, TDouble(2.5),
    Term.opaque("blob", Array[Byte](1, 2)), Term.opaque("blob", Array[Byte](3)),
    // date lexicals: full dateTime, date-only (HOURS errors), zoned
    // (TZ non-empty) — the §17.4.5 domain boundaries; lang-strings
    // with subtags so LANGMATCHES range-vs-exact diverge
    TDate("2024-03-07T15:30:45"), TDate("1995-06-17"),
    TDate("2024-03-07T15:30:45+05:30"),
    // Z and a NEGATIVE offset: TIMEZONE's PT0S / leading-sign branches
    TDate("2024-03-07T15:30:45Z"), TDate("2024-03-07T15:30:45-08:00"),
    TLangString("x", "en-US"), TLangString("y", "en"))

  val genTriple: Gen[(Term, Term, Term)] = for {
    s <- Gen.oneOf(subjects); p <- Gen.oneOf(preds); o <- Gen.oneOf(objs)
  } yield (s, p, o)

  val genDb: Gen[Seq[(Term, Term, Term)]] =
    Gen.listOfN(8, genTriple).map(_.distinct) // set semantics ≙ indexed pldb

  private val varNames = Seq("v1", "v2", "v3", "v4")
  val genTermOrVar: Gen[TermOrVar] = Gen.frequency(
    3 -> Gen.oneOf(varNames).map(V(_)),
    1 -> Gen.oneOf(subjects ++ preds ++ objs).map(T(_)))

  val genPattern: Gen[TriplePattern] = for {
    s <- genTermOrVar; p <- genTermOrVar; o <- genTermOrVar
  } yield TriplePattern(s, p, o)

  val genValues: Gen[Values] = for {
    v <- Gen.oneOf(varNames)
    coll <- Gen.nonEmptyListOf(Gen.oneOf(objs)).map(_.take(3))
  } yield Values(V(v), coll)

  // multi-var VALUES table: 2 vars, 1-3 rows, cells from the object
  // pool with UNDEF mixed in (shared-agree / UNDEF-passes / new-var
  // binding / duplicate-row bag paths all reachable)
  val genValuesTable: Gen[PatternRow] = for {
    vs <- Gen.pick(2, varNames)
    n <- Gen.choose(1, 3)
    trs <- Gen.listOfN(n, Gen.listOfN(2, Gen.frequency(
      4 -> Gen.oneOf(objs).map(t => Some(t): Option[Term]),
      1 -> Gen.const(None: Option[Term]))))
  } yield ValuesTable(vs.toSeq.map(V(_)), trs)

  // the full filter-expression surface: comparison atoms plus BOUND /
  // REGEX and one level of AND/OR/NOT composition (error semantics
  // only show under composition — !cmp on a cross-family row, BOUND
  // rescued by OR). Regex patterns stay in the Java⇄everything
  // portable subset; objs include "x"/"y" so they both hit and miss.
  // numeric expressions: dyadic constants (exact float arithmetic in
  // any order), a zero constant so the ÷0-is-error path fires, vars
  // that may be unbound / non-numeric (error propagation)
  val genNumLeaf: Gen[NumExpr] = Gen.frequency(
    3 -> Gen.oneOf(varNames).map(v => NVar(V(v)): NumExpr),
    2 -> Gen.oneOf[NumExpr](NConst(TLong(2)), NConst(TDouble(0.5)),
      NConst(TLong(0))))
  val genNumExpr: Gen[NumExpr] = Gen.frequency(
    1 -> genNumLeaf,
    2 -> (for {
      a <- genNumLeaf; b <- genNumLeaf
      f <- Gen.oneOf(Seq[(NumExpr, NumExpr) => NumExpr](
        NAdd(_, _), NSub(_, _), NMul(_, _), NDiv(_, _)))
    } yield f(a, b)))

  // §17.4 term-function expressions: leaves are vars (any kind — the
  // objs pool mixes strings/longs/keywords/nil/doubles/opaques, so
  // every domain-error path fires) and string/lang-string constants;
  // one composition level covers STR-of-UCASE etc. via the nested
  // frequency
  val genTermLeaf: Gen[TermExpr] = Gen.frequency(
    3 -> Gen.oneOf(varNames).map(v => TVar(V(v)): TermExpr),
    1 -> Gen.oneOf[TermExpr](TConst(TString("x")), TConst(TString("X")),
      TConst(TLangString("x", "en")), TConst(TLong(1))))
  val genTermFn: Gen[TermExpr] = {
    def fn(inner: Gen[TermExpr]): Gen[TermExpr] = for {
      x <- inner
      f <- Gen.oneOf[TermExpr => TermExpr](
        TStr(_), TLang(_), TDatatype(_), TStrlen(_), TUcase(_), TLcase(_),
        TSubstr(_, 1, Some(1)), TSubstr(_, 2, None),
        TAbs(_), TRound(_), TCeil(_), TFloor(_),
        TDatePart(_, DfYear), TDatePart(_, DfMonth), TDatePart(_, DfDay),
        TDatePart(_, DfHours), TDatePart(_, DfSeconds), TTz(_), TTimezone(_),
        TIri(_), TEncodeForUri(_), TBNode(_),
        THash(_, "md5"), THash(_, "sha256"))
    } yield f(x)
    Gen.frequency(
      2 -> genTermLeaf,
      3 -> fn(genTermLeaf),
      1 -> fn(fn(genTermLeaf)),
      1 -> Gen.listOfN(2, genTermLeaf).map(TConcat(_): TermExpr),
      1 -> Gen.listOfN(2, genTermLeaf).map(TCoalesce(_): TermExpr),
      1 -> (for {
        x <- genTermLeaf
        n <- Gen.oneOf("x", "X", "") // hit, miss (case), empty needle
        f <- Gen.oneOf[(TermExpr, TermExpr) => TermExpr](
          TStrBefore(_, _), TStrAfter(_, _))
      } yield f(x, TConst(TString(n)))),
      1 -> genTermLeaf.map(x => TReplace(x, "[xy]", "Z"): TermExpr),
      1 -> genTermLeaf.map(x => TStrLang(x, "en"): TermExpr),
      1 -> genTermLeaf.map(x => TStrDt(x, "urn:dt"): TermExpr))
  }

  val genFilterAtom: Gen[FilterExpr] = Gen.frequency(
    3 -> (for {
      v <- Gen.oneOf(varNames)
      op <- Gen.oneOf(Lt, Le, Gt, Ge, Neq, Eq)
      t <- Gen.oneOf[Term](TLong(1), TDouble(2.5), TString("x"))
    } yield FilterCmp(V(v), op, t): FilterExpr),
    2 -> (for {
      a <- genNumExpr
      op <- Gen.oneOf(Lt, Le, Gt, Ge, Neq, Eq)
      b <- genNumExpr
    } yield FilterArith(a, op, b): FilterExpr),
    2 -> (for {
      a <- genTermFn
      op <- Gen.oneOf(Lt, Le, Gt, Ge, Neq, Eq)
      b <- genTermFn
    } yield FilterArith(a, op, b): FilterExpr),
    2 -> (for {
      a <- Gen.oneOf(varNames)
      op <- Gen.oneOf(Lt, Le, Gt, Ge, Neq)
      b <- Gen.oneOf(varNames)
    } yield FilterVarCmp(V(a), op, V(b)): FilterExpr),
    2 -> Gen.oneOf(varNames).map(v => FilterBound(V(v)): FilterExpr),
    1 -> (for {
      e <- genTermLeaf
      f <- Gen.oneOf[TermExpr => FilterExpr](
        FilterIsIri(_), FilterIsLiteral(_), FilterIsNumeric(_))
    } yield f(e)),
    1 -> (for {
      a <- genTermLeaf; b <- genTermLeaf
    } yield FilterSameTerm(a, b): FilterExpr),
    1 -> (for {
      a <- genTermFn
      b <- Gen.frequency(
        2 -> Gen.oneOf[TermExpr](TConst(TString("x")), TConst(TString("X"))),
        1 -> genTermLeaf)
      f <- Gen.oneOf[(TermExpr, TermExpr) => FilterExpr](
        FilterStrStarts(_, _), FilterStrEnds(_, _), FilterContains(_, _))
    } yield f(a, b): FilterExpr),
    1 -> (for {
      v <- Gen.oneOf(varNames)
      p <- Gen.oneOf("^x", "y$", "[ab]", "x|z")
    } yield FilterRegex(V(v), p): FilterExpr),
    // flagged forms: 'i' flips case-sensitivity on mixed-case data;
    // 's'/'m' are exercised for lowering correctness (fixture strings
    // are single-line, so they mostly no-op — 'i' carries the signal)
    1 -> (for {
      v <- Gen.oneOf(varNames)
      p <- Gen.oneOf("^X", "[AB]", "x|Z")
      fl <- Gen.oneOf("i", "is", "im", "s", "m")
    } yield FilterRegex(V(v), p, fl): FilterExpr),
    // LANGMATCHES over LANG(?v) (the canonical form) AND over a raw
    // var (usually a domain error — the three-valued path); ranges
    // hit exact / subtag-prefix / "*" / miss
    1 -> (for {
      x <- genTermLeaf
      wrap <- Gen.oneOf[TermExpr => TermExpr](TLang(_), identity[TermExpr] _)
      r <- Gen.oneOf("en", "en-us", "*", "de")
    } yield FilterLangMatches(wrap(x), r): FilterExpr))

  val genFilterExpr: Gen[FilterExpr] = Gen.frequency(
    3 -> genFilterAtom,
    1 -> Gen.listOfN(2, genFilterAtom).map(FilterAnd(_): FilterExpr),
    1 -> Gen.listOfN(2, genFilterAtom).map(FilterOr(_): FilterExpr),
    1 -> genFilterAtom.map(FilterNot(_): FilterExpr))

  val genFilter: Gen[PatternRow] = genFilterExpr.map(f => f: PatternRow)

  // EXISTS leaves compose under AND/OR/NOT at the GROUP level only
  // (inside an optional they are legal when clause-contained; the
  // outer-ref-condition case refuses loudly, so the optional
  // generator keeps the exists-free genFilter)
  val genExistsAtom: Gen[FilterExpr] = for {
    n <- Gen.choose(1, 2)
    pats <- Gen.listOfN(n, genPattern)
  } yield FilterExists(pats)
  val genFilterTop: Gen[PatternRow] = Gen.frequency(
    4 -> genFilter,
    1 -> genExistsAtom.map(f => f: PatternRow),
    1 -> genExistsAtom.map(f => FilterNot(f): PatternRow),
    1 -> (for { e <- genExistsAtom; a <- genFilterAtom
          } yield FilterOr(Seq(a, FilterNot(e))): PatternRow),
    1 -> (for { e1 <- genExistsAtom; e2 <- genExistsAtom
          } yield FilterAnd(Seq(e1, FilterNot(e2))): PatternRow))

  // negation inner groups may carry their own filters (group-scoped:
  // the inner compile evaluates them against the inner solutions)
  val genNegation: Gen[PatternRow] = for {
    n <- Gen.choose(1, 2)
    pats <- Gen.listOfN(n, genPattern)
    fil <- Gen.frequency(
      3 -> Gen.const(Seq.empty[PatternRow]),
      1 -> genFilter.map(Seq(_)))
    isMinus <- Gen.oneOf(true, false)
  } yield if (isMinus) Minus(pats ++ fil) else NotExists(pats ++ fil)

  // optional clauses may themselves contain values, nested optionals,
  // FILTERs (scoped to the clause: they restrict which optional rows
  // match, never discarding the required solution), and negations —
  // both engines recurse
  val genOptional: Gen[Optional] = for {
    n <- Gen.choose(1, 2)
    pats <- Gen.listOfN(n, genPattern)
    extra <- Gen.frequency(
      4 -> Gen.const(Seq.empty[PatternRow]),
      1 -> genValues.map(Seq(_)),
      1 -> genPattern.map(p => Seq(Optional(Seq(p)))),
      2 -> genFilter.map(Seq(_)),
      1 -> genNegation.map(Seq(_)),
      // BIND inside the clause: group-scoped — binds only when the
      // clause matches, NULL rides the left join otherwise; a fixed
      // fresh name ("vo") also exercises the same-var-alternatives
      // coalesce when two clauses both carry a bind
      1 -> genNumExpr.map(e => Seq(Bind(e, V("vo")): PatternRow)))
  } yield Optional(pats ++ extra)

  // UNION: 2 branches of 1-2 rows each — branches may carry their own
  // filter or values, and the var pools overlap so all three join
  // regimes fire (shared-always-bound equality, branch-partial
  // §10.2-nullable, disjoint cross)
  val genUnion: Gen[PatternRow] = for {
    n1 <- Gen.choose(1, 2)
    b1 <- Gen.listOfN(n1, genPattern)
    n2 <- Gen.choose(1, 2)
    b2 <- Gen.listOfN(n2, genPattern)
    extra <- Gen.frequency(
      3 -> Gen.const(Seq.empty[PatternRow]),
      1 -> genFilter.map(Seq(_)),
      1 -> genValues.map(Seq(_)))
  } yield Union(Seq(b1, b2 ++ extra))

  // nPat may be 0: values-only and optional-only queries are legal
  // (alpha_test.clj:469-479, 792-807) and exercise the generator and
  // marker-gate paths; nVal up to 2 covers two Values clauses on the
  // SAME var (second must filter, not re-generate — membero
  // conjunction intersects)

  val genQuery: Gen[Seq[PatternRow]] = (for {
    nPat <- Gen.choose(0, 3)
    pats <- Gen.listOfN(nPat, genPattern)
    nVal <- Gen.choose(0, 2)
    vals <- Gen.listOfN(nVal, genValues)
    // up to TWO tables: a shared var introduced UNDEF-nullable by the
    // first and constrained by the second exercises the §10.2
    // compatibility-merge path (round-12 advice: the equality-form
    // join silently dropped those solutions)
    nTbl <- Gen.choose(0, 2)
    tbls <- Gen.listOfN(nTbl, genValuesTable)
    nUni <- Gen.choose(0, 1)
    unis <- Gen.listOfN(nUni, genUnion)
    nOpt <- Gen.choose(0, 2)
    opts <- Gen.listOfN(nOpt, genOptional)
    // negation/filters only when a required group exists (engine
    // refuses negation-only / filter-only queries loudly)
    nNeg <- if (nPat + nVal == 0) Gen.const(0) else Gen.choose(0, 1)
    negs <- Gen.listOfN(nNeg, genNegation)
    nFil <- if (nPat + nVal == 0) Gen.const(0) else Gen.choose(0, 2)
    fils <- Gen.listOfN(nFil, genFilterTop)
  } yield pats ++ vals ++ tbls ++ unis ++ opts ++ negs ++ fils)
    .suchThat(_.nonEmpty)

  // leg-1 superset: BIND rows (struct stores only — the dict leg
  // keeps the bind-free genQuery, dict groups refuse BIND loudly).
  // Fresh target "vb" (outside varNames) + one bind max = no
  // duplicate-target conflicts; filters over ?vb arrive via the
  // nowhere-bound var paths of genFilter.
  // BIND expressions now span the §17.4 surface: numeric ops, string
  // functions, IF (with a full three-valued condition), COALESCE
  val genBindExpr: Gen[TermExpr] = Gen.frequency(
    2 -> genNumExpr.map(e => e: TermExpr),
    2 -> genTermFn,
    1 -> (for { c <- genFilterAtom; t <- genTermFn; f <- genTermFn }
      yield TIf(c, t, f): TermExpr),
    1 -> (for { a <- genNumExpr; b <- genTermFn }
      yield TCoalesce(Seq(a, b)): TermExpr))

  val genQueryBind: Gen[Seq[PatternRow]] = for {
    q <- genQuery
    nBind <- Gen.choose(0, 1)
    bs <- Gen.listOfN(nBind, genBindExpr.map(e => Bind(e, V("vb")): PatternRow))
  } yield q ++ bs

  private[graft] def canon(rel: MiniInterp.Rel): Map[Seq[String], Int] = {
    val cols = rel.cols.toSeq.sorted
    rel.rows.map(r => cols.map(c =>
        Option(r.getOrElse(c, null)).map(_.toString).getOrElse("∅")))
      .groupBy(identity).view.mapValues(_.size).toMap
  }

  property("Spark engine ≡ in-memory interpreter on random BGPs") =
    forAll(genDb, genQueryBind) { (dbTriples, query) =>
      val expected = MiniInterp.solve(dbTriples, query)
      val db = TripleDb.fromTerms(spark, dbTriples)
      val compiled = BgpCompiler.compile(db, query)
      val cols = compiled.columns.toSet
      val gotRows = compiled.collect().toSeq.map { r =>
        compiled.columns.zipWithIndex.map { case (c, i) =>
          c -> (if (r.isNullAt(i)) null else Term.fromRow(r.getStruct(i)))
        }.toMap
      }
      val got = MiniInterp.Rel(cols, gotRows)
      val ok = cols == expected.cols && canon(got) == canon(expected)
      if (!ok) {
        println(s"DB: $dbTriples")
        println(s"QUERY: $query")
        println(s"expected cols=${expected.cols} rows=${canon(expected)}")
        println(s"got      cols=$cols rows=${canon(got)}")
      }
      ok
    }

}

/** Third leg: the dictionary-encoded path (long-keyed fold + decode at
  * the edge) against the same interpreter — decoded results must be
  * the same multiset. Separate Properties object: each case pays a
  * dict build (persist + collision-check job), so fewer cases.
  */
object DictDifferentialProps extends Properties("dict-differential") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(25)

  import DifferentialProps.{genDb, genQueryBind, canon, spark}

  /** Top-level binds now ROUTE through decode-then-extend (round 12),
    * so the dict leg keeps them and exercises the routing; binds
    * NESTED in optional clauses still refuse loudly inside the
    * recursive compile — strip those, dropping a clause that would
    * become empty. */
  private def stripBinds(rows: Seq[PatternRow]): Seq[PatternRow] =
    rows.map {
      case Optional(inner) =>
        val kept = inner.flatMap {
          case _: Bind => None
          case Optional(in2) =>
            val k2 = stripBinds(in2)
            if (k2.isEmpty) None else Some(Optional(k2))
          case other => Some(other)
        }
        if (kept.isEmpty) null else Optional(kept)
      case other => other
    }.filter(_ != null)

  property("dict-encoded engine ≡ in-memory interpreter") =
    forAll(genDb, genQueryBind.map(stripBinds)) { (dbTriples, query) =>
      if (query.isEmpty) true // shrinker can bypass suchThat(nonEmpty)
      else {
      val expected = MiniInterp.solve(dbTriples, query)
      val db = TripleDb.fromTerms(spark, dbTriples).index()
      val dd = db.dictEncode()
      try {
        val vars = graft.dsl.Bgp.allVars(query)
        val decoded = graft.engine.Projections.selectDf(dd, query, vars)
        val gotRows = decoded.collect().toSeq.map { r =>
          vars.map(_.name).zipWithIndex.map { case (c, i) =>
            c -> (if (r.isNullAt(i)) null else Term.fromRow(r.getStruct(i)))
          }.toMap
        }
        val cols = vars.map(_.name).toSet
        val got = MiniInterp.Rel(cols, gotRows)
        // selectDf projects ALL vars (padding unbound ones with NULL);
        // the interpreter relation carries only bound cols — pad it.
        val padded = MiniInterp.Rel(cols,
          expected.rows.map(r => cols.map(c => c -> r.getOrElse(c, null)).toMap))
        val ok = canon(got) == canon(padded)
        if (!ok) {
          println(s"DICT DB: $dbTriples")
          println(s"DICT QUERY: $query")
          println(s"expected rows=${canon(padded)}")
          println(s"got      rows=${canon(got)}")
        }
        ok
      } finally { dd.unpersist(); db.unpersist() }
      }
    }
}

/** Fourth leg: the quad store + the round-10 query surface (quad
  * patterns, property paths) against the same interpreter semantics —
  * random named-graph databases, random mixed queries. Fewer cases:
  * path patterns run the iterative closure (localCheckpoint rounds)
  * per case.
  */
object QuadPathDifferentialProps extends Properties("quadpath-differential") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30)

  import DifferentialProps.canon
  lazy val spark = TestSpark.session

  private val subjects = Seq(TKeyword("a"), TKeyword("b"), TKeyword("c"))
  private val preds = Seq(TKeyword("p"), TKeyword("q"))
  private val objs = Seq[Term](TString("x"), TKeyword("a"), TKeyword("b"),
    TLong(1), TNil)
  private val graphs = Seq[Term](graft.core.QuadDb.DefaultGraph,
    TUri("g1"), TUri("g2"))

  val genQuad: Gen[(Term, Term, Term, Term)] = for {
    s <- Gen.oneOf(subjects); p <- Gen.oneOf(preds)
    o <- Gen.oneOf(objs); g <- Gen.oneOf(graphs)
  } yield (s, p, o, g)

  val genQuadDb: Gen[Seq[(Term, Term, Term, Term)]] =
    Gen.listOfN(10, genQuad).map(_.distinct)

  private val varNames = Seq("v1", "v2", "v3", "gv")
  val genTv: Gen[TermOrVar] = Gen.frequency(
    3 -> Gen.oneOf(varNames).map(V(_)),
    1 -> Gen.oneOf(subjects ++ objs).map(T(_)))
  val genGv: Gen[TermOrVar] = Gen.frequency(
    2 -> Gen.oneOf(varNames).map(V(_)),
    1 -> Gen.oneOf(graphs).map(T(_)))

  val genTriplePat: Gen[TriplePattern] = for {
    s <- genTv
    p <- Gen.frequency(3 -> Gen.oneOf(preds).map(T(_): TermOrVar),
      1 -> Gen.oneOf(varNames).map(V(_): TermOrVar))
    o <- genTv
  } yield TriplePattern(s, p, o)

  val genQuadPat: Gen[QuadPattern] = for {
    s <- genTv; p <- Gen.oneOf(preds).map(T(_)); o <- genTv; g <- genGv
  } yield QuadPattern(s, p, o, g)

  val genLeafExpr: Gen[PathExpr] = Gen.oneOf(
    Gen.oneOf(preds).map(PathPred(_): PathExpr),
    Gen.oneOf(preds).map(p => PathInv(PathPred(p)): PathExpr),
    Gen.oneOf(preds).map(PathPlus(_): PathExpr),
    Gen.const(PathAltPlus(preds): PathExpr),
    // negated property sets: 1-pred and 2-pred exclusions, forward
    // and (via the composing PathInv wrapper below) inverse
    Gen.oneOf(preds).map(p => PathNeg(Seq(p)): PathExpr),
    Gen.pick(2, preds).map(ps => PathNeg(ps.toSeq): PathExpr))
  val genPathExpr: Gen[PathExpr] = Gen.frequency(
    3 -> genLeafExpr,
    1 -> Gen.listOfN(2, genLeafExpr).map(PathSeq(_): PathExpr),
    1 -> Gen.listOfN(2, genLeafExpr).map(PathAlt(_): PathExpr),
    1 -> genLeafExpr.map(PathInv(_): PathExpr),
    1 -> genLeafExpr.map(PathPlusOf(_): PathExpr),
    1 -> genLeafExpr.map(PathStar(_): PathExpr),
    1 -> genLeafExpr.map(PathOpt(_): PathExpr),
    1 -> (for {
      l <- genLeafExpr
      n <- Gen.choose(0, 2)
      m <- Gen.choose(math.max(n, 1), 3)
    } yield PathRange(l, n, m): PathExpr))
  val genPath: Gen[PathPattern] = for {
    s <- genTv
    o <- genTv
    path <- genPathExpr
  } yield PathPattern(s, path, o)
  val genQuadPath: Gen[QuadPathPattern] = for {
    s <- genTv; o <- genTv; g <- genGv
    path <- genPathExpr
  } yield QuadPathPattern(s, path, o, g)

  val genValues: Gen[Values] = for {
    v <- Gen.oneOf(varNames)
    coll <- Gen.nonEmptyListOf(Gen.oneOf(objs ++ graphs)).map(_.take(3))
  } yield Values(V(v), coll)

  lazy val genOptional: Gen[Optional] = for {
    n <- Gen.choose(1, 2)
    pats <- Gen.listOfN(n, Gen.oneOf(genTriplePat, genQuadPat))
    extra <- Gen.frequency(
      3 -> Gen.const(Seq.empty[PatternRow]),
      1 -> genNegFil.map(Seq(_))) // clause-scoped filter or negation
  } yield Optional(pats ++ extra)

  val genNegFil: Gen[PatternRow] = Gen.frequency(
    1 -> Gen.listOfN(1, Gen.oneOf(genTriplePat, genQuadPat))
      .map(NotExists(_): PatternRow),
    1 -> Gen.listOfN(1, Gen.oneOf(genTriplePat, genQuadPat))
      .map(Minus(_): PatternRow),
    1 -> (for {
      v <- Gen.oneOf(varNames)
      op <- Gen.oneOf(Lt, Le, Gt, Ge, Neq)
      t <- Gen.oneOf[Term](TLong(1), TString("x"))
    } yield FilterCmp(V(v), op, t): PatternRow),
    1 -> (for {
      v <- Gen.oneOf(varNames)
      inner <- Gen.oneOf(
        Gen.const(FilterBound(V(v)): FilterExpr),
        Gen.const(FilterRegex(V(v), "^x"): FilterExpr),
        (for {
          op <- Gen.oneOf(Lt, Gt, Neq)
          t <- Gen.oneOf[Term](TLong(1), TString("x"))
        } yield FilterCmp(V(v), op, t): FilterExpr))
      f <- Gen.oneOf(
        Gen.const(FilterNot(inner): PatternRow),
        Gen.const(FilterOr(Seq(inner,
          FilterBound(V("gv")))): PatternRow))
    } yield f))

  val genQuery: Gen[Seq[PatternRow]] = (for {
    nPat <- Gen.choose(0, 2)
    pats <- Gen.listOfN(nPat, Gen.oneOf(genTriplePat, genQuadPat))
    nPath <- Gen.choose(0, 1)
    paths <- Gen.listOfN(nPath, Gen.oneOf(genPath, genQuadPath))
    nVal <- Gen.choose(0, 1)
    vals <- Gen.listOfN(nVal, genValues)
    // UNION of quad/triple-pattern branches — graph-position vars
    // bound by only one branch exercise §10.2 on the quad leg
    nUni <- Gen.choose(0, 1)
    unis <- Gen.listOfN(nUni, for {
      b1 <- Gen.listOfN(1, Gen.oneOf(genTriplePat, genQuadPat))
      n2 <- Gen.choose(1, 2)
      b2 <- Gen.listOfN(n2, Gen.oneOf(genTriplePat, genQuadPat))
    } yield Union(Seq(b1, b2)): PatternRow)
    nOpt <- Gen.choose(0, 1)
    opts <- Gen.listOfN(nOpt, genOptional)
    // negation/filters need a required group (engine refuses otherwise)
    nNf <- if (nPat + nPath + nVal == 0) Gen.const(0) else Gen.choose(0, 1)
    nfs <- Gen.listOfN(nNf, genNegFil)
  } yield pats ++ paths ++ vals ++ unis ++ opts ++ nfs).suchThat(_.nonEmpty)

  property("quad engine (patterns+paths) ≡ in-memory interpreter") =
    forAll(genQuadDb, genQuery) { (quads, query) =>
      val expected = MiniInterp.solveQuads(quads, query)
      val db = graft.core.QuadDb.fromQuads(spark, quads)
      val compiled = BgpCompiler.compileQuads(db, query)
      val cols = compiled.columns.toSet
      val gotRows = compiled.collect().toSeq.map { r =>
        compiled.columns.zipWithIndex.map { case (c, i) =>
          c -> (if (r.isNullAt(i)) null else Term.fromRow(r.getStruct(i)))
        }.toMap
      }
      val got = MiniInterp.Rel(cols, gotRows)
      val ok = cols == expected.cols && canon(got) == canon(expected)
      if (!ok) {
        println(s"QUADS: $quads")
        println(s"QUERY: $query")
        println(s"expected cols=${expected.cols} rows=${canon(expected)}")
        println(s"got      cols=$cols rows=${canon(got)}")
      }
      ok
    }
}

/** Sixth leg (round 12): SUBQUERIES — a random inner group aggregated
  * by MIN/MAX (the canonical-total-order aggregates) joins a random
  * outer pattern group; the model composes an independent group fold
  * with a §10.2-compatibility join (an error group's aggregate is
  * unbound and must still join), against the engine's
  * SubSelect-in-the-fold path. Outer rows are required binders only
  * (patterns + values), so model join order provably commutes.
  */
object SubSelectDifferentialProps extends Properties("subselect-differential") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30)

  import DifferentialProps.{genDb, canon, spark, genPattern, genValues}
  import graft.core.Term

  private def key6(t: Term): (Byte, Double, Long, String, String, String) = {
    val r = Term.toRow(t)
    def s(i: Int) = if (r.isNullAt(i)) "" else r.getString(i)
    val i64 = t match { case TLong(x) => x; case _ => 0L }
    (r.getByte(0), if (r.isNullAt(2)) 0.0 else r.getDouble(2),
      i64, s(1), s(3), s(4))
  }
  private val termOrd: Ordering[Term] = Ordering.by(key6)

  val genSub: Gen[SubSelect] = (for {
    n <- Gen.choose(1, 2)
    pats <- Gen.listOfN(n, genPattern)
    isMax <- Gen.oneOf(true, false)
  } yield {
    val vs = pats.flatMap(_.vars).distinct
    if (vs.isEmpty) null
    else {
      val gk = vs.head
      val av = vs.last // may equal gk — MAX(group key) is legal
      SubSelect(Seq(gk, V("agv")), pats, groupBy = Seq(gk),
        aggs = Seq(Agg(if (isMax) AggMax else AggMin, Some(av), V("agv"))))
    }
  }).suchThat(_ != null)

  val genOuter: Gen[Seq[PatternRow]] = for {
    n <- Gen.choose(1, 3)
    pats <- Gen.listOfN(n, genPattern)
    nVal <- Gen.choose(0, 1)
    vals <- Gen.listOfN(nVal, genValues)
  } yield pats ++ vals

  property("SubSelect fold ≡ group fold + compatibility join") =
    forAll(genDb, genOuter, genSub) { (dbTriples, outer, sub) =>
      val outerSol = MiniInterp.solve(dbTriples, outer)
      // independent subquery evaluation: solve, pad, group, aggregate
      val subSol = MiniInterp.solve(dbTriples, sub.rows)
      val gk = sub.groupBy.head.name
      val av = sub.aggs.head.v.get.name
      val isMax = sub.aggs.head.fn == AggMax
      val padded = subSol.rows.map(r =>
        subSol.cols.map(c => c -> r.getOrElse(c, null)).toMap)
      val subRows: Seq[Map[String, Term]] =
        padded.groupBy(_(gk)).toSeq.map { case (kv, rs) =>
          val bound = rs.flatMap(r => Option(r(av)))
          val agg: Term =
            if (bound.isEmpty) null
            else if (isMax) bound.max(termOrd) else bound.min(termOrd)
          Map(gk -> kv, "agv" -> agg)
        }
      val subRel = MiniInterp.Rel(Set(gk, "agv"), subRows)
      // §10.2 compatibility join with coalesce merge
      val shared = outerSol.cols intersect subRel.cols
      val allCols = outerSol.cols ++ subRel.cols
      val joined = outerSol.rows.flatMap { b =>
        subRel.rows.flatMap { sr =>
          val ok = shared.forall { c =>
            val x = b.getOrElse(c, null); val y = sr.getOrElse(c, null)
            x == null || y == null || x == y
          }
          if (!ok) None
          else Some(allCols.map { c =>
            val bv = b.getOrElse(c, null)
            c -> (if (bv != null) bv else sr.getOrElse(c, null))
          }.toMap)
        }
      }
      val expected = MiniInterp.Rel(allCols, joined)

      val db = TripleDb.fromTerms(spark, dbTriples)
      val compiled = BgpCompiler.compile(db, outer ++ Seq(sub))
      val cols = compiled.columns.toSet
      val gotRows = compiled.collect().toSeq.map { r =>
        compiled.columns.zipWithIndex.map { case (c, i) =>
          c -> (if (r.isNullAt(i)) null else Term.fromRow(r.getStruct(i)))
        }.toMap
      }
      val got = MiniInterp.Rel(cols, gotRows)
      val ok = cols == expected.cols && canon(got) == canon(expected)
      if (!ok) {
        println(s"SUB DB: $dbTriples")
        println(s"SUB OUTER: $outer")
        println(s"SUB: $sub")
        println(s"expected cols=${expected.cols} rows=${canon(expected)}")
        println(s"got      cols=$cols rows=${canon(got)}")
      }
      ok
    }
}

/** Fifth leg (round 11): aggregation + HAVING over random BGP
  * solutions — an independent Scala fold of SPARQL §11's per-group
  * semantics against the engine's single hash-aggregate plan. The
  * numeric value pool is dyadic (1, 2.5), so float sums are exact
  * under ANY partial-aggregation merge order, and AVG divides once in
  * both models — double results compare exactly, not approximately.
  */
object AggDifferentialProps extends Properties("agg-differential") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(40)

  import DifferentialProps.{genDb, genQuery, canon, spark}
  import graft.engine.Projections
  import org.apache.spark.sql.DataFrame

  private def isNum(t: Term) =
    t.isInstanceOf[TLong] || t.isInstanceOf[TDouble]
  private def numOf(t: Term): Double = t match {
    case TLong(x) => x.toDouble
    case TDouble(d) => d
    case other => sys.error(s"not numeric: $other")
  }
  // mirror of Term.sortKey's (kind, num, int64-tie, lex, lang,
  // datatype) order — the long tie-break keeps |v| > 2^53 longs in
  // numeric order where the double num collides
  private def key6(t: Term): (Byte, Double, Long, String, String, String) = {
    val r = Term.toRow(t)
    def s(i: Int) = if (r.isNullAt(i)) "" else r.getString(i)
    val i64 = t match { case TLong(x) => x; case _ => 0L }
    (r.getByte(0), if (r.isNullAt(2)) 0.0 else r.getDouble(2),
      i64, s(1), s(3), s(4))
  }
  private val termOrd: Ordering[Term] = Ordering.by(key6)

  /** One SPARQL §11 aggregate over one group — the independent model
    * (mirrors the semantics documented on the AggFn tags). */
  private def evalAgg(a: Agg, rows: Seq[Map[String, Term]]): Term = {
    def bound: Seq[Term] =
      rows.flatMap(b => Option(b.getOrElse(a.v.get.name, null)))
    a.fn match {
      case AggCount => a.v match {
        case None => TLong(rows.size)
        case Some(_) =>
          TLong((if (a.distinct) bound.distinct else bound).size)
      }
      case AggSum =>
        val vs = bound
        if (vs.exists(v => !isNum(v))) null
        else if (vs.forall(_.isInstanceOf[TLong]))
          TLong(vs.collect { case TLong(x) => x }.sum)
        else TDouble(vs.map(numOf).sum)
      case AggAvg =>
        val vs = bound
        if (vs.exists(v => !isNum(v))) null
        else if (vs.isEmpty) TLong(0)
        else if (vs.forall(_.isInstanceOf[TLong]))
          TDouble(vs.collect { case TLong(x) => x }.sum.toDouble / vs.size)
        else TDouble(vs.map(numOf).sum / vs.size)
      case AggMin => if (bound.isEmpty) null else bound.min(termOrd)
      case AggMax => if (bound.isEmpty) null else bound.max(termOrd)
      case AggGroupConcat(sep) =>
        if (bound.exists(v => !v.isInstanceOf[TString])) null
        else TString(bound.collect { case TString(x) => x }
          .sorted.mkString(sep))
      case AggSample => sys.error("SAMPLE not fuzzed (nondeterministic)")
    }
  }

  property("aggregates + HAVING ≡ independent group fold") =
    forAll(genDb, genQuery, Gen.choose(0, 11)) { (dbTriples, query, seed) =>
      val sol = MiniInterp.solve(dbTriples, query)
      val cols = sol.cols.toSeq.sorted
      (cols.isEmpty: Boolean) || {
        val groupBy = Seq(V(cols(seed % cols.size)))
        val fns: Seq[AggFn] = Seq(AggCount, AggSum, AggAvg, AggMin,
          AggMax, AggGroupConcat("|"))
        val aggs = Agg(AggCount, None, V("a_n")) +:
          cols.zipWithIndex.map { case (c, i) =>
            val fn = fns((i + seed) % fns.size)
            Agg(fn, Some(V(c)), V(s"a_$i"),
              distinct = fn == AggCount && (i + seed) % 2 == 0)
          }
        // engine projects every col; pad the interp rel to match
        val paddedRows = sol.rows.map(r =>
          cols.map(c => c -> r.getOrElse(c, null)).toMap)
        val groups = paddedRows.groupBy(b => groupBy.map(v => b(v.name)))
        val expRows = groups.map { case (key, rows) =>
          (groupBy.map(_.name).zip(key) ++
            aggs.map(a => a.as.name -> evalAgg(a, rows))).toMap
        }.toSeq
        val outCols = (groupBy.map(_.name) ++ aggs.map(_.as.name)).toSet
        val expected = MiniInterp.Rel(outCols, expRows)
        val expectedHaving = MiniInterp.Rel(outCols, expRows.filter(r =>
          r("a_n") match { case TLong(n) => n > 1; case _ => false }))

        val db = TripleDb.fromTerms(spark, dbTriples)
        val aggDf = Projections.aggregated(
          Projections.selectDf(db, query, cols.map(V(_))), groupBy, aggs)
        def rel(df: DataFrame): MiniInterp.Rel = {
          val cs = df.columns
          MiniInterp.Rel(cs.toSet, df.collect().toSeq.map { r =>
            cs.zipWithIndex.map { case (c, i) =>
              c -> (if (r.isNullAt(i)) null else Term.fromRow(r.getStruct(i)))
            }.toMap
          })
        }
        val got = rel(aggDf)
        val gotHaving = rel(Projections.having(aggDf,
          FilterCmp(V("a_n"), Gt, TLong(1))))
        val ok = canon(got) == canon(expected) &&
          canon(gotHaving) == canon(expectedHaving)
        if (!ok) {
          println(s"AGG DB: $dbTriples")
          println(s"AGG QUERY: $query  groupBy=$groupBy seed=$seed")
          println(s"AGG SPEC: $aggs")
          println(s"expected ${canon(expected)}")
          println(s"got      ${canon(got)}")
          println(s"expected-having ${canon(expectedHaving)}")
          println(s"got-having      ${canon(gotHaving)}")
        }
        ok
      }
    }
}
