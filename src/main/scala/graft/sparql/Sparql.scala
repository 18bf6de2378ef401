package graft.sparql

import graft.core.{DictDb, DictQuadDb, QuadDb, TripleDb}
import graft.dsl._
import graft.engine.Projections
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The SPARQL text front-end: `parse` → [[SparqlQuery]] → run through
  * EXACTLY the same [[graft.engine.Projections]] pipeline a hand-built
  * DSL query takes (the front-end adds zero plan nodes — SparqlSpec
  * pins string-authored queries AST-identical to their DSL twins).
  * [[Printer.print]] is the inverse (parse ∘ print = identity on the
  * canonical forms, fuzzer-pinned), doubling as a debugging surface
  * for DSL-built queries.
  *
  * Scale shape: all composition happens on DataFrames via the
  * existing operators — aggregate queries are one hash aggregate with
  * map-side partials over the solution frame, `ORDER BY + LIMIT`
  * compiles to TakeOrderedAndProject, CONSTRUCT is one narrow select
  * per template over ONE solution frame. Nothing here collects.
  */
object Sparql {

  /** Parse a SPARQL 1.1 query string (loud position-bearing errors
    * outside the implemented subset — see [[Parser]]). */
  def parse(text: String): SparqlQuery = Parser.parse(text)

  /** Pretty-print a query to parseable SPARQL text. */
  def print(q: SparqlQuery): String = Printer.print(q)

  // ------------------------------------------------------------ SELECT

  /** Run a SELECT over a triple store. */
  def selectDf(db: TripleDb, q: SelectQuery): DataFrame =
    runSelect(q, Projections.selectDf(db, q.where, _),
      (agg, f) => Projections.having(db, agg, f, neededVars(q)))

  /** Run a SELECT over a quad store (GRAPH groups scope/bind). */
  def selectDf(db: QuadDb, q: SelectQuery): DataFrame =
    runSelect(q, Projections.selectDf(db, q.where, _),
      (agg, f) => Projections.having(db, agg, f, neededVars(q)))

  /** Run a SELECT over a dict-encoded store (terms rehydrate at the
    * plan edge; HAVING-EXISTS needs the term-level store, so an
    * EXISTS leaf in HAVING refuses here — decode first). */
  def selectDf(db: DictDb, q: SelectQuery): DataFrame =
    runSelect(q, Projections.selectDf(db, q.where, _),
      (agg, f) => Projections.having(agg, f))

  /** Run a SELECT over a dict-encoded quad store. */
  def selectDf(db: DictQuadDb, q: SelectQuery): DataFrame =
    runSelect(q, Projections.selectDf(db, q.where, _),
      (agg, f) => Projections.having(agg, f))

  /** The pre-aggregation projection (group-key refs + aggregated
    * vars) — what HAVING-EXISTS needs to tell a consumed var from a
    * fresh inner-scoped one. */
  private def neededVars(q: SelectQuery): Seq[V] =
    (q.groupBy.flatMap(_._1.refs) ++ q.aggs.flatMap(_.v)).distinct

  private def runSelect(q: SelectQuery,
      sel: Seq[V] => DataFrame,
      having: (DataFrame, FilterExpr) => DataFrame): DataFrame = {
    if (q.aggs.isEmpty) {
      val proj = if (q.proj.nonEmpty) q.proj else Bgp.allVars(q.where)
      val orderRefs = q.orderBy.flatMap(_._1.refs).distinct
      val extra = orderRefs.filterNot(v => proj.exists(_.name == v.name))
      if (extra.isEmpty)
        Projections.modifiedExpr(sel(proj), q.orderBy, q.limit, q.offset,
          q.distinct)
      else if (q.distinct)
        // §15.1's own restriction: DISTINCT + ORDER BY over
        // unprojected vars has no well-defined solution order
        throw new InvalidBgp("ORDER BY in a DISTINCT query may only " +
          s"use projected variables (got ${extra.map(_.name).mkString(", ")})")
      else
        // order on the wider frame, then project away the key refs
        Projections.modifiedExpr(sel(proj ++ extra), q.orderBy,
            q.limit, q.offset, distinct = false)
          .select(proj.map(v => col(v.name)): _*)
    } else {
      val sol = sel(neededVars(q))
      var agg = Projections.aggregatedExpr(sol, q.groupBy, q.aggs)
      for (h <- q.having) agg = having(agg, h)
      // §18.2.4.2 select expressions: extend the AGGREGATED frame in
      // written order (after HAVING, before ORDER BY — order keys may
      // read the new aliases); errors leave the alias unbound per §10.1
      if (q.postBinds.nonEmpty) agg = Projections.extend(agg, q.postBinds)
      val ordered =
        if (q.distinct) {
          val orderRefs = q.orderBy.flatMap(_._1.refs).distinct
          val bad = orderRefs.filterNot(v => q.proj.exists(_.name == v.name))
          if (bad.nonEmpty) throw new InvalidBgp(
            "ORDER BY in a DISTINCT query may only use projected " +
              s"variables (got ${bad.map(_.name).mkString(", ")})")
          Projections.modifiedExpr(agg.select(q.proj.map(v => col(v.name)): _*),
            q.orderBy, q.limit, q.offset, distinct = true)
        } else
          Projections.modifiedExpr(agg, q.orderBy, q.limit, q.offset,
            distinct = false).select(q.proj.map(v => col(v.name)): _*)
      ordered
    }
  }

  // --------------------------------------------- CONSTRUCT / ASK / DESCRIBE

  /** Run a CONSTRUCT over a triple store → a (s, p, o) term frame
    * (feed it to a [[TripleDb]], the interchange writers, or further
    * queries). One narrow select per template over ONE solution
    * frame, union, per-fact dedup — never a driver materialization. */
  def constructDf(db: TripleDb, q: ConstructQuery): DataFrame =
    graft.ops.Update.constructTriples(db, q.templates, q.where)

  /** Run an ASK. */
  def ask(db: TripleDb, q: AskQuery): Boolean = Projections.ask(db, q.where)
  def ask(db: QuadDb, q: AskQuery): Boolean = Projections.ask(db, q.where)
  def ask(db: DictDb, q: AskQuery): Boolean = Projections.ask(db, q.where)
  def ask(db: DictQuadDb, q: AskQuery): Boolean = Projections.ask(db, q.where)

  /** Run a DESCRIBE → the subject-CBD triple frame (§16.4, the
    * engine's pinned description shape). */
  def describeDf(db: TripleDb, q: DescribeQuery): DataFrame =
    Projections.describeDf(db, q.v, q.where)

  /** DESCRIBE over a quad store (descriptions keep graphs). */
  def describeDf(db: QuadDb, q: DescribeQuery): DataFrame =
    Projections.describeDf(db, q.v, q.where, alsoObjects = false)

  // --------------------------------------------------------- one-call

  /** Parse + run a query string whose form is known to be SELECT. */
  def select(db: TripleDb, text: String): DataFrame = parse(text) match {
    case q: SelectQuery => selectDf(db, q)
    case other => throw new InvalidBgp(
      s"expected a SELECT query, got ${other.getClass.getSimpleName}")
  }

  def select(db: QuadDb, text: String): DataFrame = parse(text) match {
    case q: SelectQuery => selectDf(db, q)
    case other => throw new InvalidBgp(
      s"expected a SELECT query, got ${other.getClass.getSimpleName}")
  }
}
