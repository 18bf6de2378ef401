package graft.sparql

import graft.core.Term
import graft.dsl._

/** Top-level SPARQL 1.1 query forms — the TEXT front-end's targets.
  *
  * The reference is host-language-embedded (matcha queries are Clojure
  * macros, alpha.clj:343-412), so a text grammar is a pure extension:
  * every production here lowers onto the existing [[graft.dsl]] AST
  * nodes and executes through exactly the same
  * [[graft.engine.Projections]] pipeline as a hand-built query — the
  * front-end adds ZERO plan nodes (SparqlSpec pins string-authored
  * queries AST-identical to their DSL twins, which is plan identity by
  * construction).
  *
  * Supported subset = exactly what the engine implements: SELECT /
  * CONSTRUCT / ASK / DESCRIBE over BGPs with OPTIONAL / UNION / MINUS /
  * FILTER (NOT) EXISTS / VALUES / BIND / GRAPH / property paths /
  * subqueries, aggregates + GROUP BY (expressions) + HAVING, ORDER BY
  * (expressions) / LIMIT / OFFSET / DISTINCT, and the §17 function
  * library's deterministic subset. Anything outside parses to a LOUD
  * position-bearing error ([[Parser]]), never a silent approximation.
  */
sealed trait SparqlQuery extends Product with Serializable {
  def where: Seq[PatternRow]
  def dataset: Option[Dataset]
}

/** `FROM` / `FROM NAMED` dataset clauses (§13.2): the query runs
  * against a CONSTRUCTED dataset — the default graph is the RDF MERGE
  * (set union) of the `default` graphs, and `GRAPH` ranges over
  * exactly the `named` graphs. With a dataset present the §13.3
  * active-graph rule applies FULLY: plain patterns read only the
  * constructed default graph (a documented tightening of the
  * engine's usual plain-pattern-matches-all-graphs convention, which
  * only ever applied to queries WITHOUT dataset clauses), and a
  * variable `GRAPH ?g` never binds the default graph. Executors
  * consume this on QUAD stores ([[Sparql.datasetOf]] builds the
  * restricted store; triple stores have no graphs to select — loud). */
final case class Dataset(default: Seq[Term], named: Seq[Term]) {
  if (default.isEmpty && named.isEmpty)
    throw new InvalidBgp("a dataset clause needs at least one graph")
}

/** `SELECT` — projection + solution modifiers (SPARQL §15, §11).
  *
  *  - `proj`: the projected variables, in written order (empty =
  *    `SELECT *` = all group variables, first-appearance order).
  *  - `aggs` non-empty makes this an AGGREGATE query: `proj` may then
  *    name only group keys and aggregate results (§11.4's projection
  *    restriction, enforced like [[graft.dsl.SubSelect]]).
  *  - `groupBy` pairs are the §11.1 grammar's `GROUP BY ?v` /
  *    `GROUP BY (expr AS ?v)` — a plain key is `(TVar(v), v)`.
  *  - Non-aggregate projection expressions `SELECT (expr AS ?x)`
  *    desugar at PARSE time to trailing [[graft.dsl.Bind]] rows in
  *    `where` (§18.2.4 Extend) — UNLESS the query aggregates, where
  *    they become `postBinds`: §18.2.4.2 allows later select
  *    expressions to read previously assigned aliases, so
  *    `(MAX(?b) AS ?hi) (?hi - ?lo AS ?range)` extends the AGGREGATED
  *    frame in written order (evaluated after HAVING, before ORDER
  *    BY — order keys may reference them). An aggregate CALL inside
  *    an expression stays a loud error: bind it to an alias first,
  *    which is the §18.2.4.2-legal spelling of the same query.
  */
final case class SelectQuery(
    proj: Seq[V], where: Seq[PatternRow],
    aggs: Seq[Agg] = Nil, groupBy: Seq[(TermExpr, V)] = Nil,
    having: Option[FilterExpr] = None,
    orderBy: Seq[(TermExpr, Boolean)] = Nil,
    limit: Int = -1, offset: Int = 0,
    distinct: Boolean = false,
    postBinds: Seq[Bind] = Nil,
    dataset: Option[Dataset] = None) extends SparqlQuery {
  if (where.isEmpty) throw new InvalidBgp("SELECT needs a WHERE group")
  if (aggs.isEmpty && (groupBy.nonEmpty || having.nonEmpty))
    throw new InvalidBgp("GROUP BY / HAVING need aggregates")
  if (postBinds.nonEmpty && aggs.isEmpty) throw new InvalidBgp(
    "post-aggregation binds need aggregates (non-aggregate projection " +
      "expressions desugar into the WHERE group)")
  if (aggs.nonEmpty) {
    if (proj.isEmpty) throw new InvalidBgp(
      "an aggregate SELECT must project explicitly (no SELECT *)")
    // §18.2.4.2 scoping: each select expression may read group keys,
    // aggregate aliases, and PREVIOUSLY assigned expression aliases
    var visible = (groupBy.map(_._2) ++ aggs.map(_.as)).map(_.name).toSet
    for (b <- postBinds) {
      val bad = b.expr.refs.filterNot(v => visible.contains(v.name))
      if (bad.nonEmpty) throw new InvalidBgp(
        s"select expression ?${b.as.name} reads vars not yet assigned: " +
          bad.map(_.name).mkString(", "))
      visible += b.as.name
    }
    val bad = proj.filterNot(v => visible.contains(v.name))
    if (bad.nonEmpty) throw new InvalidBgp(
      s"SELECT projects non-grouped vars: ${bad.map(_.name).mkString(", ")}")
  }
}

/** `CONSTRUCT { triples } WHERE { group }` (§16.2): instantiate the
  * triple templates per solution; a solution leaving any template
  * position unbound emits nothing for that template. */
final case class ConstructQuery(
    templates: Seq[(TermOrVar, TermOrVar, TermOrVar)],
    where: Seq[PatternRow],
    dataset: Option[Dataset] = None) extends SparqlQuery {
  if (templates.isEmpty)
    throw new InvalidBgp("CONSTRUCT needs at least one template")
  if (where.isEmpty) throw new InvalidBgp("CONSTRUCT needs a WHERE group")
}

/** `ASK WHERE { group }` (§16.3). */
final case class AskQuery(where: Seq[PatternRow],
    dataset: Option[Dataset] = None) extends SparqlQuery {
  if (where.isEmpty) throw new InvalidBgp("ASK needs a WHERE group")
}

/** `DESCRIBE ?v WHERE { group }` (§16.4) — the engine's pinned
  * bnode-free CBD ([[graft.engine.Projections.describeDf]]). The
  * subset takes exactly one variable (DESCRIBE <iri> sugar =
  * `DESCRIBE ?v WHERE { VALUES ?v { <iri> } }`, which the parser
  * accepts and lowers to exactly that). */
final case class DescribeQuery(v: V, where: Seq[PatternRow],
    dataset: Option[Dataset] = None) extends SparqlQuery {
  if (where.isEmpty) throw new InvalidBgp("DESCRIBE needs a WHERE group")
}
