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

  // ----------------------------------------------------------- dataset

  /** Build the §13.2 dataset over a quad store: the default graph is
    * the RDF MERGE (set union — one dedup of only the selected
    * graphs' rows, never the store) of the FROM graphs, tagged as the
    * engine's default graph; FROM NAMED graphs keep their names. The
    * two parts are disjoint by graph name, so distinctness survives
    * the union. Scans of the source stay PRUNED: graph membership is
    * a pushed scan filter. */
  def datasetOf(db: QuadDb, d: Dataset): QuadDb = {
    import graft.core.Term
    def inGraphs(frame: DataFrame, gs: Seq[Term]): DataFrame =
      if (gs.isEmpty) frame.where(functionsLitFalse)
      else frame.where(gs.map(g => col("g") === Term.lit(g)).reduce(_ || _))
    def part(frame: DataFrame): DataFrame = {
      val defaults = inGraphs(frame, d.default)
        .select("s", "p", "o").dropDuplicates("s", "p", "o")
        .withColumn("g", Term.lit(QuadDb.DefaultGraph))
        .select("s", "p", "o", "g")
      defaults.unionByName(inGraphs(frame, d.named))
    }
    QuadDb(part(db.df),
      db.predIndex.map { case (n2, d2) => n2 -> part(d2) },
      db.stats, distinct = db.distinct)
  }

  private def functionsLitFalse =
    org.apache.spark.sql.functions.lit(false)

  /** The §13.3 active-graph rewrite that makes a dataset query read
    * the CONSTRUCTED dataset faithfully: plain triple/path rows scope
    * to the constructed default graph, and a variable `GRAPH ?g`
    * additionally excludes it (GRAPH ranges over NAMED graphs only) —
    * the exclusion filter lands INSIDE the group that binds the var,
    * guarded by BOUND so optional groups keep their §18.5 scoping. */
  private[sparql] def datasetScope(rows: Seq[PatternRow]): Seq[PatternRow] = {
    import graft.core.QuadDb.DefaultGraph
    val out = rows.map {
      case TriplePattern(s, p, o)  => QuadPattern(s, p, o, T(DefaultGraph))
      case PathPattern(s, p, o)    =>
        QuadPathPattern(s, p, o, T(DefaultGraph))
      case Optional(inner)         => Optional(datasetScope(inner))
      case Union(bs)               => Union(bs.map(datasetScope))
      case NotExists(inner)        => NotExists(datasetScope(inner))
      case Minus(inner)            => Minus(datasetScope(inner))
      case ss: SubSelect           => ss.copy(rows = datasetScope(ss.rows))
      case f: FilterExpr           => scopeFilter(f)
      case other                   => other // quad rows / values / binds
    }
    val varGs = rows.collect {
      case QuadPattern(_, _, _, g: V)     => g
      case QuadPathPattern(_, _, _, g: V) => g
    }.distinct
    out ++ varGs.map(g => FilterOr(Seq(
      FilterNot(FilterBound(g)),
      FilterNot(FilterSameTerm(TVar(g), TConst(DefaultGraph))))))
  }

  private def scopeFilter(f: FilterExpr): FilterExpr = f match {
    case FilterAnd(es)      => FilterAnd(es.map(scopeFilter))
    case FilterOr(es)       => FilterOr(es.map(scopeFilter))
    case FilterNot(e)       => FilterNot(scopeFilter(e))
    case FilterExists(rows) => FilterExists(datasetScope(rows))
    case leaf               => leaf
  }

  private def noDataset(q: SparqlQuery, what: String): Unit =
    if (q.dataset.nonEmpty) throw new InvalidBgp(
      s"FROM/FROM NAMED need a QUAD store ($what has no graphs to " +
        "select from) — or pre-build the dataset with Sparql.datasetOf")

  // ------------------------------------------------------------ SELECT

  /** Run a SELECT over a triple store. */
  def selectDf(db: TripleDb, q: SelectQuery): DataFrame = {
    noDataset(q, "a triple store")
    runSelect(q, Projections.selectDf(db, q.where, _),
      (agg, f) => Projections.having(db, agg, f, neededVars(q)))
  }

  /** Run a SELECT over a quad store (GRAPH groups scope/bind; FROM /
    * FROM NAMED clauses run against the §13.2 constructed dataset
    * under the full §13.3 active-graph rule — see [[datasetOf]]). */
  def selectDf(db: QuadDb, q: SelectQuery): DataFrame = q.dataset match {
    case None => runSelect(q, Projections.selectDf(db, q.where, _),
      (agg, f) => Projections.having(db, agg, f, neededVars(q)))
    case Some(d) =>
      val store = datasetOf(db, d)
      val rows = datasetScope(q.where)
      runSelect(q, Projections.selectDf(store, rows, _),
        (agg, f) => Projections.having(store, agg, f, neededVars(q)))
  }

  /** Run a SELECT over a dict-encoded store (terms rehydrate at the
    * plan edge; HAVING-EXISTS needs the term-level store, so an
    * EXISTS leaf in HAVING refuses here — decode first). */
  def selectDf(db: DictDb, q: SelectQuery): DataFrame = {
    noDataset(q, "a dict store")
    runSelect(q, Projections.selectDf(db, q.where, _),
      (agg, f) => Projections.having(agg, f))
  }

  /** Run a SELECT over a dict-encoded quad store (FROM clauses need
    * the term-level quad store — datasetOf then dictEncode). */
  def selectDf(db: DictQuadDb, q: SelectQuery): DataFrame = {
    noDataset(q, "a dict-encoded store")
    runSelect(q, Projections.selectDf(db, q.where, _),
      (agg, f) => Projections.having(agg, f))
  }

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
  def constructDf(db: TripleDb, q: ConstructQuery): DataFrame = {
    noDataset(q, "the CONSTRUCT executor's triple store")
    graft.ops.Update.constructTriples(db, q.templates, q.where)
  }

  /** Run an ASK. */
  def ask(db: TripleDb, q: AskQuery): Boolean = {
    noDataset(q, "a triple store")
    Projections.ask(db, q.where)
  }
  /** ASK over a quad store — FROM clauses apply ([[datasetOf]]). */
  def ask(db: QuadDb, q: AskQuery): Boolean = q.dataset match {
    case None => Projections.ask(db, q.where)
    case Some(d) =>
      Projections.ask(datasetOf(db, d), datasetScope(q.where))
  }
  def ask(db: DictDb, q: AskQuery): Boolean = {
    noDataset(q, "a dict store")
    Projections.ask(db, q.where)
  }
  def ask(db: DictQuadDb, q: AskQuery): Boolean = {
    noDataset(q, "a dict-encoded store")
    Projections.ask(db, q.where)
  }

  /** Run a DESCRIBE → the subject-CBD triple frame (§16.4, the
    * engine's pinned description shape). */
  def describeDf(db: TripleDb, q: DescribeQuery): DataFrame = {
    noDataset(q, "a triple store")
    Projections.describeDf(db, q.v, q.where)
  }

  /** DESCRIBE over a quad store (descriptions keep graphs; FROM
    * clauses restrict both the MATCH and the DESCRIPTION to the
    * constructed dataset). */
  def describeDf(db: QuadDb, q: DescribeQuery): DataFrame = q.dataset match {
    case None =>
      Projections.describeDf(db, q.v, q.where, alsoObjects = false)
    case Some(d) =>
      Projections.describeDf(datasetOf(db, d), q.v,
        datasetScope(q.where), alsoObjects = false)
  }

  // --------------------------------------------------------- one-call

  /** The whole protocol edge in one call: parse ANY query form, run
    * it, and return the standard response BODY — SELECT → a
    * sparql-results+json document, ASK → the boolean document,
    * CONSTRUCT / DESCRIBE → an N-Triples document. Driver-side by
    * nature (an HTTP response is one bounded string — the same
    * contract as [[graft.sources.SparqlResults.toJsonDoc]]); the
    * distributed paths are the form-specific executors. */
  def runToJson(db: TripleDb, text: String): String = parse(text) match {
    case q: SelectQuery => graft.sources.SparqlResults.toJsonDoc(
      selectDf(db, q))
    case q: AskQuery => graft.sources.SparqlResults.askJsonDoc(ask(db, q))
    case q: ConstructQuery => ntriplesBody(constructDf(db, q))
    case q: DescribeQuery  => ntriplesBody(describeDf(db, q))
  }

  /** [[runToJson]] over a quad store (DESCRIBE keeps graphs — its
    * body is N-Quads; CONSTRUCT stays the triple executor's form). */
  def runToJson(db: QuadDb, text: String): String = parse(text) match {
    case q: SelectQuery => graft.sources.SparqlResults.toJsonDoc(
      selectDf(db, q))
    case q: AskQuery => graft.sources.SparqlResults.askJsonDoc(ask(db, q))
    case q: DescribeQuery => nquadsBody(describeDf(db, q))
    // the protocol edge does the graph-collapse routing itself: a
    // CONSTRUCT over a quad store queries the union-of-graphs view
    // (constructDf's per-fact dedup restores set semantics, so
    // toTriples' distinctness loss is invisible)
    case q: ConstructQuery => ntriplesBody(constructDf(db.toTriples, q))
  }

  private def boundedRows(df: DataFrame, writer: String) =
    graft.sources.SparqlResults.boundedRows(df, writer)

  private def ntriplesBody(triples: DataFrame): String = {
    import org.apache.spark.sql.functions.{concat_ws, lit}
    import graft.sources.NTriples
    boundedRows(triples.select(concat_ws(" ",
        NTriples.termToken(col("s")), NTriples.termToken(col("p")),
        NTriples.termToken(col("o")), lit("."))), "NTriples.save")
      .map(_.getString(0)).mkString("", "\n", "\n")
  }

  private def nquadsBody(quads: DataFrame): String = {
    import org.apache.spark.sql.functions.{concat_ws, lit, when}
    import graft.core.{QuadDb => Q, Term}
    import graft.sources.NTriples
    // default-graph quads serialize without a label (the N-Quads rule)
    val g = when(col("g") === Term.lit(Q.DefaultGraph),
      lit(null).cast("string")).otherwise(NTriples.termToken(col("g")))
    boundedRows(quads.select(concat_ws(" ",
        NTriples.termToken(col("s")), NTriples.termToken(col("p")),
        NTriples.termToken(col("o")), g, lit("."))), "NTriples.saveQuads")
      .map(_.getString(0)).mkString("", "\n", "\n")
  }

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
