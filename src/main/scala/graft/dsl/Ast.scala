package graft.dsl

import graft.core.Term

/** Query DSL AST — the Scala counterpart of the reference's macro DSL
  * (alpha.clj:130-173 spec grammar). The sealed ADT makes most of the
  * reference's compile-time spec validation (alpha.clj:205-250) a type
  * error instead of a runtime exception; what remains dynamic (a `values`
  * binding that isn't a flat collection, alpha_test.clj:430-448) throws
  * [[InvalidValues]] at construction.
  *
  * Grammar (SURVEY §2.5):
  * {{{
  * bgps        := Seq[PatternRow]
  * pattern-row := TriplePattern | Values | Optional
  * term        := V(name) | T(term-value)
  * }}}
  */
sealed trait TermOrVar extends Product with Serializable
/** A query variable — any `?name` symbol in the reference (alpha.clj:78-83). */
final case class V(name: String) extends TermOrVar {
  require(name.nonEmpty, "variable name must be non-empty")
}
/** A ground term. */
final case class T(t: Term) extends TermOrVar

object TermOrVar {
  import scala.language.implicitConversions
  implicit def termToPos(t: Term): TermOrVar = T(t)
}

sealed trait PatternRow extends Product with Serializable {
  /** Distinct variables, first-appearance order (≙ find-vars, alpha.clj:85-89). */
  def vars: Seq[V]
}

/** One `[s p o]` BGP row (alpha.clj:188-191). */
final case class TriplePattern(s: TermOrVar, p: TermOrVar, o: TermOrVar)
    extends PatternRow {
  def vars: Seq[V] = Seq(s, p, o).collect { case v: V => v }.distinct
}

/** One `[s p o g]` graph-scoped BGP row — the named-graph extension the
  * reference lacks (it destructures Quads but DROPS `g`, alpha.clj:54-58;
  * alpha_test.clj:244-245). Only valid against a [[graft.core.QuadDb]]
  * (compiling one against a triple store throws [[InvalidBgp]]). Ground
  * `g` scopes the pattern to one named graph (a pushed-down scan
  * filter); variable `g` binds the containing graph per solution. A
  * plain [[TriplePattern]] against a quad store matches the union of
  * all graphs (see QuadDb's dataset-semantics note).
  */
final case class QuadPattern(s: TermOrVar, p: TermOrVar, o: TermOrVar,
                             g: TermOrVar) extends PatternRow {
  def vars: Seq[V] = Seq(s, p, o, g).collect { case v: V => v }.distinct
}

/** `[s (PathPlus p) o]` — one-or-more transitive traversal of a ground
  * predicate, the `p+` property path (SPARQL 1.1 §9.1) as a BGP row.
  * The reference descopes property paths (README:41-45); this composes
  * [[graft.ops.Paths]]' distributed closure into the BGP join fold, so
  * transitive hops are expressible where users write queries and join
  * against other patterns, `optional`, and `values` like any row.
  * Endpoints may be ground or variables; the predicate must be ground
  * (a variable-predicate closure is unbounded — [[InvalidBgp]]).
  */
final case class PathPattern(s: TermOrVar, path: PathExpr, o: TermOrVar)
    extends PatternRow {
  def vars: Seq[V] = Seq(s, o).collect { case v: V => v }.distinct
}

sealed trait PathExpr extends Product with Serializable {
  /** The ground edge predicates this path traverses. */
  def preds: Seq[Term]
}
/** `p+`: one or more hops over `pred` edges. */
final case class PathPlus(pred: Term) extends PathExpr {
  def preds: Seq[Term] = Seq(pred)
}
/** `(p1|p2|…)+`: one or more hops, each over ANY of the given
  * predicates (the alternation-then-plus form, enough to express
  * "related transitively via any of these links"). */
final case class PathAltPlus(alts: Seq[Term]) extends PathExpr {
  require(alts.nonEmpty, "path alternation needs at least one predicate")
  def preds: Seq[Term] = alts
}
/** `p`: a single hop over one ground predicate — the elementary path
  * element (SPARQL 1.1 PredicatePath), useful as a step inside
  * [[PathSeq]]/[[PathAlt]]/[[PathInv]]. */
final case class PathPred(pred: Term) extends PathExpr {
  def preds: Seq[Term] = Seq(pred)
}
/** `^elt`: the inverse path — every (s, o) connected by `inner` in
  * reverse (SPARQL 1.1 InversePath). Composable: `^p` inside a
  * sequence walks the edge backwards, `^(p1/p2)` reverses the whole
  * sequence. */
final case class PathInv(inner: PathExpr) extends PathExpr {
  def preds: Seq[Term] = inner.preds
}
/** `!(p1|p2|…)`: negated property set (SPARQL 1.1 §9.1
  * PathNegatedPropertySet, forward members) — one hop over ANY edge
  * whose predicate is NOT in `excluded`. The grammar's inverse
  * members compose from the existing algebra instead of widening the
  * leaf: `!(^p)` ≡ [[PathInv]]([[PathNeg]](Seq(p))), and a mixed set
  * `!(p1|^p2)` ≡ [[PathAlt]](Seq(PathNeg(Seq(p1)),
  * PathInv(PathNeg(Seq(p2))))) — SPARQL defines the mixed form as
  * exactly that union. `preds` is empty: the traversed predicates are
  * the store-dependent complement, so no slice pruning applies (the
  * scan is the full relation minus the excluded slices — a pushed
  * scan-side inequality, zero joins; an id inequality on dict
  * stores). */
final case class PathNeg(excluded: Seq[Term]) extends PathExpr {
  require(excluded.nonEmpty, "negated property set needs at least one predicate")
  def preds: Seq[Term] = Nil
}

/** `e1/e2/…`: sequence — relational composition of the step paths
  * (SPARQL 1.1 SequencePath). `customer —c_nationkey→ ^s_nationkey→
  * supplier` is the co-located-in-a-nation join written as one path. */
final case class PathSeq(steps: Seq[PathExpr]) extends PathExpr {
  require(steps.nonEmpty, "path sequence needs at least one step")
  def preds: Seq[Term] = steps.flatMap(_.preds).distinct
}
/** `e1|e2|…`: alternation — union of the alternative paths (SPARQL
  * 1.1 AlternativePath). The general form of [[PathAltPlus]]'s
  * predicate list: alternatives may be any path elements. */
final case class PathAlt(alts: Seq[PathExpr]) extends PathExpr {
  require(alts.nonEmpty, "path alternation needs at least one element")
  def preds: Seq[Term] = alts.flatMap(_.preds).distinct
}
/** `(elt)+`: one or more hops over an arbitrary inner path element —
  * the general transitive form ([[PathPlus]]/[[PathAltPlus]] are the
  * common ground-predicate shorthands, kept for their tighter
  * edge-scan plans). */
final case class PathPlusOf(inner: PathExpr) extends PathExpr {
  def preds: Seq[Term] = inner.preds
}
/** `(elt)*`: zero or more hops. The zero-length component follows
  * SPARQL 1.1 §18.4 ZeroLengthPath: it relates every term OF THE
  * STORE (any subject or object position, any predicate — not just
  * the path's own edges) to itself; under a graph scope, every term
  * of that graph. NOTE the scale cost is explicit: a var/var `p*`
  * enumerates the store's node set (one distinct over two columns);
  * ground endpoints only pay an existence probe. */
final case class PathStar(inner: PathExpr) extends PathExpr {
  def preds: Seq[Term] = inner.preds
}
/** `(elt)?`: zero or one hop — the zero-length component as in
  * [[PathStar]], plus the single-hop pairs. */
final case class PathOpt(inner: PathExpr) extends PathExpr {
  def preds: Seq[Term] = inner.preds
}
/** `elt{n,m}`: between `n` and `m` hops of the inner element —
  * the bounded quantifier (dropped from SPARQL 1.1 final but commonly
  * requested; SPARQL 1.0 property-path drafts and most engines ship
  * it). `n = 0` includes the zero-length component with exactly
  * [[PathStar]]'s node-universe semantics. Pairs are DISTINCT like
  * every path form. `m` bounds the iteration, so unlike `+`/`*` no
  * fixpoint is needed — each hop advances one composition. */
final case class PathRange(inner: PathExpr, min: Int, max: Int)
    extends PathExpr {
  require(min >= 0, "path quantifier min must be >= 0")
  require(max >= math.max(min, 1),
    "path quantifier max must be >= max(min, 1)")
  def preds: Seq[Term] = inner.preds
}

/** `GRAPH g { s path o }` — a graph-scoped path: EVERY hop of the
  * path walks edges of one named graph (SPARQL 1.1 §13.3 semantics:
  * the path evaluates inside the graph, it cannot hop across graphs).
  * Ground `g` scopes the edge scans; a variable `g` binds the
  * containing graph per solution — internally the walk runs over
  * (graph, node) composite keys so closure/sequence stay inside each
  * graph in ONE pass, never one job per graph. Requires a quad store
  * ([[InvalidBgp]] otherwise). */
final case class QuadPathPattern(s: TermOrVar, path: PathExpr,
                                 o: TermOrVar, g: TermOrVar)
    extends PatternRow {
  def vars: Seq[V] = Seq(s, o, g).collect { case v: V => v }.distinct
}

/** `(values ?v coll)` — bind ?v to members of a runtime collection
  * (alpha.clj:91-105, 175-176). Bag semantics: duplicates in `coll`
  * duplicate solutions, exactly like `l/membero`.
  */
final case class Values(v: V, coll: Iterable[Term]) extends PatternRow {
  if (coll == null) throw new InvalidValues(
    s"values binding for ?${v.name} must be a collection, got null")
  def vars: Seq[V] = Seq(v)
}

/** `VALUES (?a ?b …) { (t …) (UNDEF …) … }` (SPARQL §10.2): an inline
  * solution MULTISET over several variables, joined into the group by
  * solution compatibility — a table row matches a solution when they
  * agree on every shared var whose cell is DEFINED; an UNDEF cell
  * (None) constrains nothing, and binds nothing when the var is new
  * (the var stays unbound for that row). Duplicate table rows
  * multiply (bag semantics, like [[Values]]). The single-var
  * [[Values]] remains the reference-parity membero form with its
  * tuned OR-chain/semi-join plans; this is the general table form. */
final case class ValuesTable(vs: Seq[V], rows: Seq[Seq[Option[Term]]])
    extends PatternRow {
  if (vs.isEmpty) throw new InvalidValues("VALUES needs at least one var")
  if (vs.distinct.size != vs.size)
    throw new InvalidValues(s"VALUES vars must be distinct: $vs")
  for (r <- rows if r.size != vs.size)
    throw new InvalidValues(
      s"VALUES row arity ${r.size} != ${vs.size} vars: $r")
  def vars: Seq[V] = vs
}

/** `(optional [...])` (alpha.clj:107-124) — group may fail without
  * discarding the solution; nestable.
  */
final case class Optional(rows: Seq[PatternRow]) extends PatternRow {
  def vars: Seq[V] = rows.flatMap(_.vars).distinct
}

/** `{ A } UNION { B } UNION …` (SPARQL §7 / §18.2.2 Union): the
  * MULTISET union of the branch groups' solutions, joined into the
  * enclosing group like any member (§18.5's Join is commutative).
  * Branches evaluate independently and may contain anything a group
  * can (patterns, values, optionals, filters, paths, negation,
  * subqueries, nested unions). A variable bound by only SOME branches
  * is UNBOUND in the other branches' solutions — the classic
  * "match either shape, keep the columns" idiom — so downstream
  * joins/filters treat it exactly like an optional-bound var (§10.2
  * compatibility where it matters). Bag semantics: a solution
  * produced by k branches appears k times (SPARQL Union is additive,
  * never deduping). */
final case class Union(branches: Seq[Seq[PatternRow]]) extends PatternRow {
  if (branches.size < 2)
    throw new InvalidBgp("UNION needs at least two branches")
  for (b <- branches if b.isEmpty)
    throw new InvalidBgp("UNION branches must be non-empty groups")
  def vars: Seq[V] = branches.flatMap(Bgp.allVars).distinct
}

/** `{ SELECT … }` — a SUBQUERY as a pattern row (SPARQL §12): the
  * inner group evaluates bottom-up and INDEPENDENTLY (aggregates →
  * HAVING → modifiers → projection to `proj`), then joins the
  * enclosing group on whatever projected vars are shared — the
  * "join each nation to its max-balance supplier" composition that
  * needs aggregation INSIDE a query. Only `proj` is visible outside
  * (§12.4 variable scoping). A projected aggregate can be UNBOUND
  * (an error group), so the enclosing join uses §10.2 compatibility
  * when that can happen.
  *
  * Aggregate/modifier semantics are exactly
  * [[graft.engine.Projections.aggregated]] / `.modified`'s (see the
  * [[AggFn]] tags); `orderBy` inside a subquery is global to the
  * subquery per the SPARQL algebra (Slice ∘ OrderBy ∘ Project).
  * DICT stores evaluate the inner pipeline over decoded terms and
  * re-encode the projection by the pure term hash — which round-trips
  * only for terms the store (or its values collections) can supply,
  * so dict groups accept the VALUE-PRESERVING aggregates
  * (MIN/MAX/SAMPLE) and refuse SUM/COUNT/AVG/GROUP_CONCAT loudly
  * (a computed term the dictionary never issued cannot ride an
  * 8-byte id frame — the same principle as in-group BIND). */
final case class SubSelect(proj: Seq[V], rows: Seq[PatternRow],
                           groupBy: Seq[V] = Nil, aggs: Seq[Agg] = Nil,
                           having: Option[FilterExpr] = None,
                           orderBy: Seq[OrderKey] = Nil,
                           limit: Int = -1, offset: Int = 0,
                           distinct: Boolean = false) extends PatternRow {
  if (proj.isEmpty) throw new InvalidBgp("subquery must project >= 1 var")
  if (rows.isEmpty) throw new InvalidBgp("subquery needs a group")
  if (aggs.isEmpty && (groupBy.nonEmpty || having.nonEmpty))
    throw new InvalidBgp("GROUP BY / HAVING need aggregates")
  if (aggs.nonEmpty) {
    val visible = (groupBy ++ aggs.map(_.as)).map(_.name).toSet
    val bad = proj.filterNot(v => visible.contains(v.name))
    if (bad.nonEmpty) throw new InvalidBgp(
      s"subquery projects non-grouped vars: ${bad.map(_.name).mkString(", ")}")
  }
  def vars: Seq[V] = proj
}

/** `FILTER NOT EXISTS { ... }` (SPARQL 1.1 §8.1) — drop every
  * REQUIRED solution for which the inner group matches (correlation =
  * the variables shared with the required solution set; with no
  * shared variables the group acts as an inverted existence gate:
  * any inner match empties the result). Negation is an extension
  * beyond the reference, which has no negation form. Inner-group
  * variables do NOT project into the solution. */
final case class NotExists(rows: Seq[PatternRow]) extends PatternRow {
  require(rows.nonEmpty, "NOT EXISTS needs at least one inner row")
  /** Binds nothing: inner vars are scoped to the group. */
  def vars: Seq[V] = Nil
  def innerVars: Seq[V] = rows.flatMap(_.vars).distinct
}

/** `MINUS { ... }` (SPARQL 1.1 §8.2) — remove required solutions that
  * are join-compatible with some inner solution on their SHARED
  * variables; with no shared variables nothing is removed (the SPARQL
  * dom-disjoint rule — the documented divergence from NOT EXISTS). */
final case class Minus(rows: Seq[PatternRow]) extends PatternRow {
  require(rows.nonEmpty, "MINUS needs at least one inner row")
  def vars: Seq[V] = Nil
  def innerVars: Seq[V] = rows.flatMap(_.vars).distinct
}

/** Comparison operator for [[FilterCmp]]. */
sealed trait CmpOp extends Product with Serializable
case object Lt extends CmpOp
case object Le extends CmpOp
case object Gt extends CmpOp
case object Ge extends CmpOp
case object Neq extends CmpOp
/** `=` — value equality within the comparable families (the §17.4.1.9
  * `IN` operator expands to an OR of these; like [[Neq]], a
  * cross-family pair is a type error rather than RDFterm-unequal —
  * the documented subset). */
case object Eq extends CmpOp

/** A FILTER expression row (SPARQL 1.1 §17 expression subset).
  *
  * Evaluation semantics (SPARQL §17.2, exactly the SQL three-valued
  * model): each atom yields true, false, or ERROR (SQL NULL) —
  * comparing an UNBOUND variable or terms of incomparable families is
  * an error. [[FilterAnd]]/[[FilterOr]]/[[FilterNot]] combine with
  * SQL NULL logic, which IS SPARQL's error table (error AND false =
  * false, error OR true = true, NOT error = error); a solution
  * survives only when the whole expression is true (errors remove
  * the row). Filters are evaluated against the solutions of the
  * GROUP they are written in, AFTER that group's optional clauses
  * extend them (SPARQL §18.5 evaluation order) — so a filter naming
  * an optional-bound variable tests it per row (unbound = error =
  * row removed), and a filter written INSIDE an `optional` group
  * scopes to that group: it restricts which optional rows match,
  * never discarding the required solution. Filter rows bind nothing.
  */
sealed trait FilterExpr extends PatternRow {
  final def vars: Seq[V] = Nil
  /** Variables the expression reads (not bound — read). */
  def refs: Seq[V]
}

object FilterExpr {
  /** Distinct variables read anywhere in a filter tree. */
  def referencedVars(f: FilterExpr): Seq[V] = f.refs.distinct
}

/** `FILTER (?v < const)` — a value comparison against a constant,
  * restricted to the comparable families: numerics compare
  * numerically with long↔double promotion — long vs long stays EXACT
  * on the 64-bit lexical value — strings by binary codepoint order,
  * dates by canonical ISO order. A term outside the constant's family
  * is a type ERROR (removes the row unless rescued by OR), and `Neq`
  * follows the same comparable-family restriction — the supported
  * subset, documented. */
final case class FilterCmp(v: V, op: CmpOp, t: Term) extends FilterExpr {
  def refs: Seq[V] = Seq(v)
}

/** `FILTER (?a < ?b)` — a comparison between two variables, same
  * comparable-family semantics as [[FilterCmp]] decided per ROW
  * (long vs long exact, numeric promotion otherwise, string/date by
  * order, cross-family = error). */
final case class FilterVarCmp(a: V, op: CmpOp, b: V) extends FilterExpr {
  def refs: Seq[V] = Seq(a, b)
}

/** `BOUND(?v)` — true iff the solution binds `?v` (SPARQL §17.4.1.1).
  * Never errors: unbound is plain `false`, so `!BOUND(?v)` /
  * `!BOUND(?v) || ?v > x` express the classic negation-as-failure and
  * default-value idioms over optional-bound variables. */
final case class FilterBound(v: V) extends FilterExpr {
  def refs: Seq[V] = Seq(v)
}

/** `REGEX(?v, pattern [, flags])` — Java-regex match (unanchored
  * find, like SPARQL/XPath fn:matches) over STRING terms; non-string
  * terms and unbound variables are type errors. Patterns restricted
  * to the Java⇄RE2-portable subset keep DuckDB `regexp_matches`
  * oracles replayable (the q57 PII precedent). Flags are the
  * XPath/RE2-portable trio — `i` (case-insensitive), `s` (dot
  * matches newline), `m` (multi-line anchors) — lowered by the
  * engine as an inline `(?ism)` prefix, which Java and RE2 read
  * identically; `x`/`q` (whitespace-elision, literal-quote) differ
  * across engines and refuse here. */
final case class FilterRegex(v: V, pattern: String, flags: String = "")
    extends FilterExpr {
  require(pattern.nonEmpty, "regex pattern must be non-empty")
  require(flags.forall("ism".contains(_)),
    s"unsupported REGEX flags '$flags' (portable subset: i, s, m)")
  require(flags.distinct == flags, s"duplicate REGEX flags '$flags'")
  def refs: Seq[V] = Seq(v)
}

/** `expr && expr && …` (SPARQL §17.4.1.5 logical-and error table =
  * SQL three-valued AND). */
final case class FilterAnd(exprs: Seq[FilterExpr]) extends FilterExpr {
  require(exprs.nonEmpty, "AND needs at least one operand")
  def refs: Seq[V] = exprs.flatMap(_.refs)
}

/** `expr || expr || …` (SPARQL §17.4.1.4 logical-or error table =
  * SQL three-valued OR). */
final case class FilterOr(exprs: Seq[FilterExpr]) extends FilterExpr {
  require(exprs.nonEmpty, "OR needs at least one operand")
  def refs: Seq[V] = exprs.flatMap(_.refs)
}

/** `!expr` (SPARQL §17.4.1.7 — NOT error = error). */
final case class FilterNot(expr: FilterExpr) extends FilterExpr {
  def refs: Seq[V] = expr.refs
}

/** TERM-valued expressions (SPARQL §17.3/§17.4 subset): every node
  * evaluates per solution row to a term or an ERROR (§17.2 — in a
  * FILTER an error drops the row, in a BIND it leaves the target
  * unbound). [[NumExpr]] is the numeric sub-family; the string /
  * accessor / branch functions below extend the same tree, so they
  * compose anywhere a numeric expression already could (BIND,
  * FilterArith comparisons, IF branches). */
sealed trait TermExpr extends Product with Serializable {
  def refs: Seq[V]
}

/** Numeric value expressions (SPARQL §17.3's XPath operator mapping,
  * numeric subset): operands are numeric TERMS — an unbound variable
  * or a non-numeric term makes the whole expression an ERROR (the
  * §17.2 table then applies: in a FILTER the row drops, in a BIND the
  * var stays unbound for that row). Promotion: long op long stays
  * EXACT int64 (Java wrap semantics on overflow, documented) except
  * `/`, which is always a double (SPARQL: integer ÷ integer is
  * decimal); any double operand promotes to double. Division by an
  * exact-zero divisor is an error (the deterministic subset — no
  * INF/NaN terms reach results). */
sealed trait NumExpr extends TermExpr
final case class NVar(v: V) extends NumExpr { def refs: Seq[V] = Seq(v) }
final case class NConst(t: Term) extends NumExpr {
  require(t.isInstanceOf[Term.TLong] || t.isInstanceOf[Term.TDouble],
    s"numeric constant required, got $t")
  def refs: Seq[V] = Nil
}
final case class NAdd(a: NumExpr, b: NumExpr) extends NumExpr {
  def refs: Seq[V] = a.refs ++ b.refs
}
final case class NSub(a: NumExpr, b: NumExpr) extends NumExpr {
  def refs: Seq[V] = a.refs ++ b.refs
}
final case class NMul(a: NumExpr, b: NumExpr) extends NumExpr {
  def refs: Seq[V] = a.refs ++ b.refs
}
final case class NDiv(a: NumExpr, b: NumExpr) extends NumExpr {
  def refs: Seq[V] = a.refs ++ b.refs
}

// ---- SPARQL §17.4 function library (term-valued leaves; every
// function follows the documented deterministic subset — precise
// domains on each node, anything outside is a type ERROR) ----

/** A variable as a general term expression (any kind — unlike
  * [[NVar]], which errors on non-numerics; use NVar inside numeric
  * ops, TVar inside string/accessor functions). */
final case class TVar(v: V) extends TermExpr { def refs: Seq[V] = Seq(v) }
/** A ground term constant (any kind). */
final case class TConst(t: Term) extends TermExpr { def refs: Seq[V] = Nil }

/** `STR(e)` (§17.4.2.5): the lexical form as a plain string — defined
  * for the kinds that CARRY a lexical form (string, lang-string,
  * typed literal, long, date, keyword, URI); doubles/booleans store
  * no canonical lexical in this engine's term encoding, so they are
  * errors (deterministic-subset rule: no engine-specific float
  * formatting can leak into results). */
final case class TStr(e: TermExpr) extends TermExpr { def refs: Seq[V] = e.refs }
/** `LANG(e)` (§17.4.2.6): the language tag of a lang-string, `""` for
  * any other literal kind (string/typed/long/double/bool/date);
  * keywords, URIs, nil, opaques are errors. */
final case class TLang(e: TermExpr) extends TermExpr { def refs: Seq[V] = e.refs }
/** `DATATYPE(e)` (§17.4.2.7) as a URI term: xsd:string for plain
  * strings, rdf:langString for lang-strings, the carried datatype for
  * typed literals, xsd:integer/double/boolean/date for the value
  * kinds; non-literals error. */
final case class TDatatype(e: TermExpr) extends TermExpr { def refs: Seq[V] = e.refs }
/** `STRLEN(e)` (§17.4.3.1): character length of a string or
  * lang-string. */
final case class TStrlen(e: TermExpr) extends TermExpr { def refs: Seq[V] = e.refs }
/** `SUBSTR(e, start[, len])` (§17.4.3.3): 1-based (XPath), over a
  * string or lang-string — the language tag rides along per spec. */
final case class TSubstr(e: TermExpr, start: Int, len: Option[Int] = None)
    extends TermExpr {
  require(start >= 1, "SUBSTR start is 1-based (XPath fn:substring)")
  require(len.forall(_ >= 0), "SUBSTR length must be non-negative")
  def refs: Seq[V] = e.refs
}
/** `UCASE(e)` (§17.4.3.4) — string/lang-string, tag preserved. */
final case class TUcase(e: TermExpr) extends TermExpr { def refs: Seq[V] = e.refs }
/** `LCASE(e)` (§17.4.3.5) — string/lang-string, tag preserved. */
final case class TLcase(e: TermExpr) extends TermExpr { def refs: Seq[V] = e.refs }
/** `STRBEFORE(e, needle)` (§17.4.3.4): the part of arg1 before the
  * FIRST occurrence of the plain-string needle — arg1's language tag
  * rides on a match, but a MISS yields the plain empty string ""
  * (the spec's asymmetry, implemented exactly); arg1 must be a
  * string or lang-string, the needle a plain string. An empty needle
  * matches at position 0 ("" / ""@-less per spec). */
final case class TStrBefore(e: TermExpr, needle: TermExpr) extends TermExpr {
  def refs: Seq[V] = e.refs ++ needle.refs
}
/** `STRAFTER(e, needle)` (§17.4.3.5) — dual of [[TStrBefore]]: the
  * part after the first occurrence; empty needle returns arg1
  * whole. */
final case class TStrAfter(e: TermExpr, needle: TermExpr) extends TermExpr {
  def refs: Seq[V] = e.refs ++ needle.refs
}
/** `REPLACE(e, pattern, replacement)` (§17.4.3.15), literal-
  * replacement subset: Java/RE2-portable patterns (the FilterRegex
  * rule) and a replacement WITHOUT `$`/`\` references — Spark and
  * external SQL engines disagree on backreference syntax, so the
  * deterministic subset bans them (loud require). String or
  * lang-string, tag preserved. */
final case class TReplace(e: TermExpr, pattern: String, replacement: String)
    extends TermExpr {
  require(pattern.nonEmpty, "REPLACE pattern must be non-empty")
  require(!replacement.contains("$") && !replacement.contains("\\"),
    "REPLACE replacement must be literal (no $N/\\N backreferences — " +
      "engines disagree on the syntax; the deterministic subset)")
  def refs: Seq[V] = e.refs
}

/** `CONCAT(e…)` (§17.4.3.12), plain-string subset: every argument
  * must evaluate to a plain string (mixed lang-tag propagation is out
  * of the deterministic subset — documented). */
final case class TConcat(es: Seq[TermExpr]) extends TermExpr {
  require(es.nonEmpty, "CONCAT needs at least one argument")
  def refs: Seq[V] = es.flatMap(_.refs)
}
/** `STRLANG(e, "lang")` (§17.4.3.9): construct a language-tagged
  * string from a PLAIN string (any other kind errors, per spec —
  * STRLANG of an already-tagged string is an error). The tag is a
  * literal constant (the common form; a dynamic-tag second argument
  * is out of the deterministic subset). */
final case class TStrLang(e: TermExpr, lang: String) extends TermExpr {
  require(lang.nonEmpty, "STRLANG tag must be non-empty")
  def refs: Seq[V] = e.refs
}
/** `STRDT(e, datatypeIri)` (§17.4.3.10): construct a typed literal
  * from a PLAIN string; constant datatype IRI (same subset rule as
  * [[TStrLang]]). */
final case class TStrDt(e: TermExpr, datatype: String) extends TermExpr {
  require(datatype.nonEmpty, "STRDT datatype must be non-empty")
  def refs: Seq[V] = e.refs
}

/** Date/time component selector for [[TDatePart]] (§17.4.5). */
sealed trait DateField extends Product with Serializable
/** `YEAR(e)` (§17.4.5.1). */ case object DfYear extends DateField
/** `MONTH(e)` (§17.4.5.2). */ case object DfMonth extends DateField
/** `DAY(e)` (§17.4.5.3). */ case object DfDay extends DateField
/** `HOURS(e)` (§17.4.5.4). */ case object DfHours extends DateField
/** `MINUTES(e)` (§17.4.5.5). */ case object DfMinutes extends DateField
/** `SECONDS(e)` (§17.4.5.6). */ case object DfSeconds extends DateField

/** Date/time component accessors (§17.4.5), deterministic subset:
  * defined over date terms ([[graft.core.Term.TDate]]) whose
  * canonical ISO lexical starts `yyyy-MM-dd` — YEAR/MONTH/DAY read
  * the date components; HOURS/MINUTES/SECONDS additionally require
  * a `THH:mm:ss` time part (a date-only term is an ERROR for them,
  * per the spec's xsd:dateTime domain). Components are exact int64
  * terms decomposed from the LEXICAL form — pure fixed-position
  * string arithmetic, so both oracle engines replay it with zero
  * date-library drift; SECONDS returns the INTEGRAL seconds (a
  * fractional part in the lexical is ignored — the spec's
  * xsd:decimal seconds are out of the deterministic subset).
  * Negative (BCE) years are out of the subset (error). Anything
  * non-date — or unbound — is a type ERROR. */
final case class TDatePart(e: TermExpr, field: DateField) extends TermExpr {
  def refs: Seq[V] = e.refs
}
/** `TZ(e)` (§17.4.5.8): the timezone designator of a date term's
  * lexical as a plain string — `"Z"`, `"+05:30"`-style offsets, or
  * `""` when the lexical carries none (the spec's no-timezone rule).
  * Non-dates error. (TIMEZONE, §17.4.5.7, returns an
  * xsd:dayTimeDuration and ERRORS on missing zones — compose
  * `IF(TZ(e) = "", error-branch, …)` for that; the string form is
  * the deterministic subset.) */
final case class TTz(e: TermExpr) extends TermExpr { def refs: Seq[V] = e.refs }

/** `TIMEZONE(e)` (§17.4.5.7): the timezone designator of a date
  * term's lexical as an `xsd:dayTimeDuration` TYPED literal — the
  * spec's own form, completing the accessor family beside [[TTz]]'s
  * string form. XSD canonical duration: `"Z"` / `"+00:00"` /
  * `"-00:00"` → `"PT0S"`, `"+05:30"` → `"PT5H30M"`, `"-05:00"` →
  * `"-PT5H"` (zero components drop; the sign prints only when
  * negative and nonzero). A lexical carrying NO designator is an
  * ERROR per spec (contrast TZ, which returns `""`); non-dates and
  * unbound error as always. Decomposed by fixed-position lexical
  * arithmetic like [[TDatePart]] — both oracle engines replay the
  * identical string math, zero calendar drift by construction. */
final case class TTimezone(e: TermExpr) extends TermExpr {
  def refs: Seq[V] = e.refs
}

/** `IRI(e)` / `URI(e)` (§17.4.2.8): constructs a URI term from a
  * plain string (taken as an ABSOLUTE IRI — base resolution is out
  * of the deterministic subset; relative strings mint verbatim, like
  * the interchange writers' `urn:graft:rel/` contract documents for
  * export); a URI operand passes through unchanged per spec. Other
  * kinds error. */
final case class TIri(e: TermExpr) extends TermExpr { def refs: Seq[V] = e.refs }

/** `ENCODE_FOR_URI(e)` (§17.4.3.11): percent-encodes every character
  * of a plain string except the RFC 3986 unreserved set
  * (ALPHA / DIGIT / `-` `.` `_` `~`) — each other character's UTF-8
  * bytes become uppercase `%XX` triples, exactly fn:encode-for-uri.
  * Plain strings only (a lang-tagged operand is an error, per the
  * simple-literal/xsd:string domain). */
final case class TEncodeForUri(e: TermExpr) extends TermExpr {
  def refs: Seq[V] = e.refs
}

/** `BNODE(e)` (§17.4.2.9), skolem subset: maps a plain string to the
  * engine's reserved skolem-IRI scheme
  * (`urn:graft:bnode/query/<arg>` — the same RDF 1.1 §3.5 space the
  * interchange readers mint into, so the writers' restore mode
  * round-trips it back to `_:query.<arg>`). DOCUMENTED DIVERGENCE:
  * the spec scopes BNODE(str) per solution (two solutions get
  * distinct nodes); a per-solution gensym is non-replayable, so the
  * deterministic subset makes it a pure function of the argument —
  * equal strings mint EQUAL nodes across solutions, which is the
  * useful (and skolemization-consistent) behavior for minting
  * stable subjects in CONSTRUCT pipelines. The no-argument BNODE()
  * (a fresh node per call) is not provided at all — same reason. */
final case class TBNode(e: TermExpr) extends TermExpr { def refs: Seq[V] = e.refs }

/** `MD5(e)` / `SHA256(e)` (§17.4.4.12/14): lowercase-hex digest of a
  * plain string's UTF-8 bytes, as a plain string. Only the two
  * algorithms BOTH oracle engines ship are accepted — SHA1 / SHA384 /
  * SHA512 have no DuckDB twin, so they refuse loudly at construction
  * (the deterministic subset). */
final case class THash(e: TermExpr, algo: String) extends TermExpr {
  require(algo == "md5" || algo == "sha256",
    s"hash algorithm must be md5 or sha256 (the deterministic, " +
      s"both-engine subset — SHA1/384/512 have no oracle twin), got '$algo'")
  def refs: Seq[V] = e.refs
}

/** `ABS(e)` (§17.4.4.1): exact int64 on longs (Long.MinValue wraps —
  * Java semantics, documented), double on doubles; non-numeric =
  * error. */
final case class TAbs(e: TermExpr) extends TermExpr { def refs: Seq[V] = e.refs }
/** `ROUND(e)` (§17.4.4.2) = XPath fn:round: the nearest integer,
  * ties toward +∞ — implemented as floor(x + 0.5) IDENTICALLY in
  * both engines (library round() differs cross-engine at .5: Spark
  * HALF_UP rounds −2.5 to −3, fn:round says −2). Longs are returned
  * unchanged; the result keeps the operand's kind per XPath. */
final case class TRound(e: TermExpr) extends TermExpr { def refs: Seq[V] = e.refs }
/** `CEIL(e)` (§17.4.4.3) — double-preserving ceiling (longs
  * unchanged). */
final case class TCeil(e: TermExpr) extends TermExpr { def refs: Seq[V] = e.refs }
/** `FLOOR(e)` (§17.4.4.4) — double-preserving floor (longs
  * unchanged). */
final case class TFloor(e: TermExpr) extends TermExpr { def refs: Seq[V] = e.refs }

/** `IF(cond, then, else)` (§17.4.1.2): the condition evaluates with
  * full three-valued semantics — a condition ERROR is an expression
  * error (not the else branch). */
final case class TIf(cond: FilterExpr, t: TermExpr, f: TermExpr)
    extends TermExpr {
  def refs: Seq[V] = cond.refs ++ t.refs ++ f.refs
}
/** `COALESCE(e…)` (§17.4.1.3): the first argument that evaluates
  * without error; error iff all do. The classic default-value idiom
  * over optional-bound vars: `COALESCE(?maybe, 0)`. */
final case class TCoalesce(es: Seq[TermExpr]) extends TermExpr {
  require(es.nonEmpty, "COALESCE needs at least one argument")
  def refs: Seq[V] = es.flatMap(_.refs)
}

/** `FILTER (expr op expr)` — comparison of two general term
  * expressions (`?a * 2 < ?b + 1`, `UCASE(?n) = "X"`). Both sides
  * evaluate under [[TermExpr]] rules; the comparison itself follows
  * [[FilterVarCmp]]'s per-row family semantics (long/long exact,
  * numeric promotion, string/date by order, cross-family = error). */
final case class FilterArith(a: TermExpr, op: CmpOp, b: TermExpr)
    extends FilterExpr {
  def refs: Seq[V] = a.refs ++ b.refs
}

/** `STRSTARTS(e1, e2)` (§17.4.3.2 argument-compatibility subset):
  * arg1 a string or lang-string, arg2 a plain string — else error. */
final case class FilterStrStarts(e: TermExpr, prefix: TermExpr)
    extends FilterExpr {
  def refs: Seq[V] = e.refs ++ prefix.refs
}
/** `STRENDS(e1, e2)` — domain as [[FilterStrStarts]]. */
final case class FilterStrEnds(e: TermExpr, suffix: TermExpr)
    extends FilterExpr {
  def refs: Seq[V] = e.refs ++ suffix.refs
}
/** `CONTAINS(e1, e2)` — domain as [[FilterStrStarts]]. */
final case class FilterContains(e: TermExpr, needle: TermExpr)
    extends FilterExpr {
  def refs: Seq[V] = e.refs ++ needle.refs
}

/** `LANGMATCHES(e, range)` (§17.4.3.13): RFC 4647 basic filtering of
  * a language TAG (usually `LANG(?v)` — a plain string) against a
  * constant language RANGE: case-insensitive, `"en"` matches `"en"`
  * AND `"en-US"` (a range matches any tag it prefixes at a `-`
  * boundary), and `"*"` matches every NON-EMPTY tag — so
  * `LANGMATCHES(LANG(?v), "*")` is "has some language", false for
  * plain/typed literals whose LANG is `""`. A non-plain-string first
  * argument (unbound included) is a type ERROR. The range is a
  * constant (the universal real-query form; a dynamic range is out
  * of the deterministic subset). */
final case class FilterLangMatches(e: TermExpr, range: String)
    extends FilterExpr {
  require(range.nonEmpty, "LANGMATCHES range must be non-empty")
  def refs: Seq[V] = e.refs
}

/** `isIRI(e)` (§17.4.2.1): true for URI terms AND keywords (the
  * reference's keyword terms function as its IRIs — documented
  * extension of the RDF mapping); false for every other bound kind;
  * an unbound operand is a type error per spec. */
final case class FilterIsIri(e: TermExpr) extends FilterExpr {
  def refs: Seq[V] = e.refs
}
/** `isLiteral(e)` (§17.4.2.2): true for the literal kinds (string,
  * lang-string, typed, long, double, bool, date). */
final case class FilterIsLiteral(e: TermExpr) extends FilterExpr {
  def refs: Seq[V] = e.refs
}
/** `isNumeric(e)` (§17.4.2.4): true for longs and doubles. */
final case class FilterIsNumeric(e: TermExpr) extends FilterExpr {
  def refs: Seq[V] = e.refs
}
/** `sameTerm(a, b)` (§17.4.1.8): TERM identity — field-wise struct
  * equality, NO numeric promotion (`sameTerm(1, 1.0)` is false where
  * `1 = 1.0` is true); unbound on either side is a type error. */
final case class FilterSameTerm(a: TermExpr, b: TermExpr) extends FilterExpr {
  def refs: Seq[V] = a.refs ++ b.refs
}

/** `EXISTS { … }` as a FILTER-expression LEAF (§17.4.1.4): true iff
  * the inner group has at least one solution COMPATIBLE (§10.2:
  * shared vars bound on both sides must agree; an unbound side
  * constrains nothing) with the current row; never errors, so it
  * composes under `&&`/`||`/`!` per the SPARQL grammar — e.g.
  * `FILTER(EXISTS{A} || !EXISTS{B})` — which the row-level
  * [[NotExists]] cannot express (it only negates at the top).
  * `!EXISTS{…}` as the whole filter ≡ the [[NotExists]] row
  * (spec-pinned). Inner-group vars do NOT project; `refs` reports
  * the inner vars so the filter schedules after anything that could
  * bind them (correlation is decided per frame at evaluation time).
  * Restrictions (loud InvalidBgp): not inside an optional's
  * outer-referencing condition filter, not inside BIND/HAVING
  * expressions — existence needs the store, which those evaluation
  * points don't carry. */
final case class FilterExists(rows: Seq[PatternRow]) extends FilterExpr {
  require(rows.nonEmpty, "EXISTS needs at least one inner row")
  def refs: Seq[V] = rows.flatMap(_.vars).distinct
}

/** `expr IN (t1, …, tn)` (§17.4.1.9): defined as the equality
  * OR-chain, so it IS one — built, not stored (same error semantics:
  * `2 IN (1, "a")` is an error-rescued-by-nothing → false… per the
  * §17.2 table `false || error = error`, which removes the row). */
object FilterIn {
  def apply(v: V, terms: Seq[Term]): FilterExpr = {
    require(terms.nonEmpty, "IN needs at least one term")
    FilterOr(terms.map(t => FilterCmp(v, Eq, t)))
  }
}

/** `BIND (expr AS ?v)` (SPARQL §10.1), numeric-expression subset:
  * extends each solution of its group with `?v` = the expression's
  * value; an ERROR (unbound operand, non-numeric, ÷0) leaves `?v`
  * UNBOUND for that row — the row itself is kept (§10.1's Extend
  * semantics, unlike a FILTER). Evaluation order within the group:
  * after the pattern/optional folds, before the group's filters —
  * so filters can read bound vars; binds evaluate in written order,
  * so a later bind may reference an earlier one. `?v` must be fresh
  * in the group (InvalidBgp otherwise, per the SPARQL grammar
  * restriction). Struct/quad stores only — a dict-store group
  * refuses loudly (8-byte id frames cannot carry computed terms;
  * bind after decode via [[graft.engine.Projections.extend]]). */
final case class Bind(expr: TermExpr, as: V) extends PatternRow {
  def vars: Seq[V] = Seq(as)
}

/** Aggregate function tags (SPARQL 1.1 §11). Semantics notes on
  * [[graft.engine.Projections.aggregated]]. */
sealed trait AggFn extends Product with Serializable
/** COUNT — `v = None` in [[Agg]] is `COUNT(*)` (solutions), bound `v`
  * counts that var's BOUND values (§11.4.1). */
case object AggCount extends AggFn
/** SUM over numerics: exact int64 while every value is a long, double
  * otherwise; a bound NON-numeric makes the group's value an error
  * (unbound result), `SUM({}) = 0` (§11.4.2 + XPath op:numeric-add). */
case object AggSum extends AggFn
/** AVG = SUM/COUNT (exact-long sum divided once while all values are
  * long — deterministic under any merge order); `AVG({}) = 0`
  * (§11.4.3). */
case object AggAvg extends AggFn
/** MIN under the engine's canonical TOTAL term order
  * ([[graft.core.Term.sortKey]]) — a documented extension of §11.4.4's
  * comparison-error semantics (mixed-kind groups order by kind instead
  * of erroring); empty group → unbound. */
case object AggMin extends AggFn
/** MAX — dual of [[AggMin]] (§11.4.5). */
case object AggMax extends AggFn
/** SAMPLE — some bound value of the group (§11.4.6; which one is
  * implementation-defined, here whichever Spark's `first` meets). */
case object AggSample extends AggFn
/** GROUP_CONCAT over STRING values with the given separator; the
  * concatenation order — implementation-defined in §11.4.7 — is
  * PINNED to sorted order here so results are deterministic and
  * oracle-replayable; a bound non-string value is an error (unbound
  * result). */
final case class AggGroupConcat(sep: String) extends AggFn

/** One aggregate: `fn` over `v` (None only for COUNT(*)), result
  * bound to `as`. `distinct` is supported for COUNT (§11's
  * DISTINCT set-conversion; other functions refuse loudly — the
  * supported subset, documented). */
final case class Agg(fn: AggFn, v: Option[V], as: V,
                     distinct: Boolean = false) {
  require(v.nonEmpty || fn == AggCount, s"$fn needs a variable")
  require(!distinct || fn == AggCount,
    "DISTINCT is supported for COUNT only")
}

/** One ORDER BY key for the solution modifiers (SPARQL §15.1):
  * solutions order by `v`'s term under the canonical total order
  * ([[graft.core.Term.sortKey]] — kind-grouped, unbound first,
  * numeric kinds by value, deterministic lexical tie-breaks),
  * ascending unless `asc = false`. Applied via
  * [[graft.engine.Projections.modified]]. */
final case class OrderKey(v: V, asc: Boolean = true)

/** `GRAPH g { rows }` authoring sugar (SPARQL §13.3): scopes every
  * pattern row of a group to one graph term/var by REWRITING to the
  * exact per-row quad forms the compiler already takes —
  * [[TriplePattern]]→[[QuadPattern]], [[PathPattern]]→
  * [[QuadPathPattern]], [[Optional]]/[[Union]]/[[NotExists]]/
  * [[Minus]] recursively, and EXISTS leaves inside filters
  * (§13.3: the active graph inside the group IS g, existence
  * included). Built, not stored (the [[FilterIn]] pattern), so the
  * plan is byte-identical to writing the quad rows by hand — the
  * sugar only removes the footgun where one row of a group forgets
  * the shared graph var. Rows with no graph position ([[Values]]/
  * [[ValuesTable]]/[[Bind]]/plain filters) pass through unchanged:
  * they constrain solutions, not quads, exactly as if written inside
  * the graph group directly. Rows ALREADY graph-scoped and
  * subqueries refuse loudly — nested/overlapping scopes must stay
  * explicit (a subquery's §12 variable scoping would otherwise
  * silently swallow a variable `g`). */
object GraphScope {
  def apply(g: TermOrVar, rows: Seq[PatternRow]): Seq[PatternRow] = rows.map {
    case TriplePattern(s, p, o)  => QuadPattern(s, p, o, g)
    case PathPattern(s, path, o) => QuadPathPattern(s, path, o, g)
    case Optional(inner)         => Optional(apply(g, inner))
    case Union(branches)         => Union(branches.map(apply(g, _)))
    case NotExists(inner)        => NotExists(apply(g, inner))
    case Minus(inner)            => Minus(apply(g, inner))
    case f: FilterExpr           => scopeFilter(g, f)
    case r @ (_: Values | _: ValuesTable | _: Bind) => r
    case r @ (_: QuadPattern | _: QuadPathPattern) => throw new InvalidBgp(
      s"GRAPH group over an already graph-scoped row: $r — nested " +
        "graph scopes must stay explicit")
    case r: SubSelect => throw new InvalidBgp(
      s"GRAPH group over a subquery: scope the subquery's own rows " +
        s"explicitly (§12 variable scoping makes an implicit rewrite " +
        s"of $r ambiguous for a variable graph)")
  }

  private def scopeFilter(g: TermOrVar, f: FilterExpr): FilterExpr = f match {
    case FilterAnd(es)      => FilterAnd(es.map(scopeFilter(g, _)))
    case FilterOr(es)       => FilterOr(es.map(scopeFilter(g, _)))
    case FilterNot(e)       => FilterNot(scopeFilter(g, e))
    case FilterExists(rows) => FilterExists(apply(g, rows))
    case leaf               => leaf
  }
}

/** ≙ the reference's `::invalid-bgp` (alpha.clj:205-213). */
final class InvalidBgp(msg: String) extends IllegalArgumentException(msg)
/** ≙ the reference's `::invalid-values` (alpha.clj:220-228). */
final class InvalidValues(msg: String) extends IllegalArgumentException(msg)

object Bgp {
  /** Distinct vars of a BGP in first-appearance order, with required /
    * optional split: a var is *optional* iff it appears in `Optional`
    * rows and in no required row (alpha.clj:301-313).
    */
  def requiredVars(rows: Seq[PatternRow]): Seq[V] =
    rows.collect { case r: TriplePattern => r; case r: QuadPattern => r
                   case r: PathPattern => r; case r: QuadPathPattern => r
                   case r: Values => r; case r: ValuesTable => r
                   case r: SubSelect => r; case r: Union => r }
      .flatMap(_.vars).distinct

  def optionalVars(rows: Seq[PatternRow]): Seq[V] = {
    val req = requiredVars(rows).toSet
    rows.collect { case o: Optional => o }.flatMap(_.vars)
      .distinct.filterNot(req)
  }

  def allVars(rows: Seq[PatternRow]): Seq[V] = rows.flatMap(_.vars).distinct

  /** Every term appearing in a `values` collection, anywhere in the BGP
    * (optionals included). The dict-encoded path needs them at decode
    * time: a values generator binds collection elements that may not
    * exist in the db's dictionary.
    */
  def valuesTerms(rows: Seq[PatternRow]): Seq[Term] = rows.flatMap {
    case Values(_, coll)      => coll.toSeq
    case ValuesTable(_, trs)  => trs.flatten.flatten
    case Optional(inner)      => valuesTerms(inner)
    case ss: SubSelect        => valuesTerms(ss.rows)
    case u: Union             => u.branches.flatMap(valuesTerms)
    case _                    => Nil
  }
}
