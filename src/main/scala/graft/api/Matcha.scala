package graft.api

import graft.core.{Term, TripleDb}
import graft.dsl._
import graft.engine.Projections
import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing query API mirroring the reference's surface (SURVEY §2.1):
  * `select / select1 / construct / construct1 / build / build1 / ask`,
  * each in an immediate arity (db last) and a "prepared" arity returning
  * a reusable function (≙ the db-less macro arities, alpha.clj:359-361,
  * README:252-268 — alpha_test.clj:362-398 proves the equivalence).
  *
  * Parameterization is ordinary Scala lexical scoping, exactly as the
  * reference uses Clojure lexical scoping (s-expressions in term
  * position are evaluated before matching, alpha.clj:130-131).
  */
object Matcha {

  // ---- select ----
  /** 1-var scalar unwrap ≙ alpha.clj:375-381. */
  def select(vars: Seq[V], bgps: Seq[PatternRow], db: TripleDb): Seq[Any] = {
    val rows = Projections.select(db, bgps, vars)
    if (vars.size == 1) rows.map(_.head) else rows
  }
  def select(vars: Seq[V], bgps: Seq[PatternRow]): TripleDb => Seq[Any] =
    select(vars, bgps, _)
  /** Arity-1: project all vars in first-appearance order (alpha.clj:357-358). */
  def select(bgps: Seq[PatternRow], db: TripleDb): Seq[Any] =
    select(Bgp.allVars(bgps), bgps, db)

  def select1(vars: Seq[V], bgps: Seq[PatternRow], db: TripleDb): Option[Any] =
    select(vars, bgps, db).headOption
  def select1(vars: Seq[V], bgps: Seq[PatternRow]): TripleDb => Option[Any] =
    select1(vars, bgps, _)

  /** Distributed select — the scale path; stays a DataFrame. */
  def selectDf(vars: Seq[V], bgps: Seq[PatternRow], db: TripleDb): DataFrame =
    Projections.selectDf(db, bgps, vars)

  /** Distributed select over a dictionary-encoded store (long-keyed
    * join fold, terms rehydrated at the edge) — same results, built for
    * repeated queries / join-heavy BGPs. See [[graft.core.DictDb]].
    */
  def selectDf(vars: Seq[V], bgps: Seq[PatternRow],
               db: graft.core.DictDb): DataFrame =
    Projections.selectDf(db, bgps, vars)

  /** Distributed select over a quad (named-graph) store —
    * [[graft.dsl.QuadPattern]] rows scope/bind the graph position; an
    * extension beyond the reference, which drops a Quad's 4th element
    * (alpha.clj:54-58). See [[graft.core.QuadDb]].
    */
  def selectDf(vars: Seq[V], bgps: Seq[PatternRow],
               db: graft.core.QuadDb): DataFrame =
    Projections.selectDf(db, bgps, vars)

  /** Distributed select over the dict-encoded QUAD store — the
    * long-keyed fold with the graph id as a fourth key. */
  def selectDf(vars: Seq[V], bgps: Seq[PatternRow],
               db: graft.core.DictQuadDb): DataFrame =
    Projections.selectDf(db, bgps, vars)

  // ---- ask ----
  def ask(bgps: Seq[PatternRow], db: TripleDb): Boolean = Projections.ask(db, bgps)
  def ask(bgps: Seq[PatternRow]): TripleDb => Boolean = ask(bgps, _)
  def ask(bgps: Seq[PatternRow], db: graft.core.QuadDb): Boolean =
    Projections.ask(db, bgps)
  def ask(bgps: Seq[PatternRow], db: graft.core.DictQuadDb): Boolean =
    Projections.ask(db, bgps)

  // ---- construct ----
  def construct(template: Any, bgps: Seq[PatternRow], db: TripleDb): Seq[Any] =
    Projections.construct(db, template, bgps)
  def construct(template: Any, bgps: Seq[PatternRow]): TripleDb => Seq[Any] =
    construct(template, bgps, _)
  def construct1(template: Any, bgps: Seq[PatternRow], db: TripleDb): Option[Any] =
    Projections.construct1(db, template, bgps)
  def construct1(template: Any, bgps: Seq[PatternRow]): TripleDb => Option[Any] =
    construct1(template, bgps, _)

  /** Distributed construct grouping — the scale path for flat magic-key
    * templates; stays a DataFrame (see Projections.constructDf). */
  def constructDf(subj: V, entries: Seq[(String, V)], bgps: Seq[PatternRow],
                  db: TripleDb): org.apache.spark.sql.DataFrame =
    Projections.constructDf(db, subj, entries, bgps)

  // ---- build ----
  def build(subj: TermOrVar, template: Map[Any, Any], bgps: Seq[PatternRow],
            db: TripleDb): Seq[Map[Any, Any]] =
    Projections.build(db, subj, template, bgps)
  def build(subj: TermOrVar, template: Map[Any, Any], bgps: Seq[PatternRow],
            subjKey: Term, db: TripleDb): Seq[Map[Any, Any]] =
    Projections.build(db, subj, template, bgps, subjKey)
  def build(subj: TermOrVar, template: Map[Any, Any],
            bgps: Seq[PatternRow]): TripleDb => Seq[Map[Any, Any]] =
    build(subj, template, bgps, _)
  /** ⚠ The reference's prepared-fn `build-1` arity forgets `first`
    * (alpha.clj:634-637); we implement the documented intent (SURVEY
    * §2.1 row 11).
    */
  def build1(subj: TermOrVar, template: Map[Any, Any], bgps: Seq[PatternRow],
             db: TripleDb): Option[Map[Any, Any]] =
    Projections.build1(db, subj, template, bgps)
  def build1(subj: TermOrVar, template: Map[Any, Any],
             bgps: Seq[PatternRow]): TripleDb => Option[Map[Any, Any]] =
    build1(subj, template, bgps, _)

  // ---- db constructors (≙ index-triples / merge-dbs) ----
  def indexTriples(spark: SparkSession, triples: Seq[(Term, Term, Term)]): TripleDb =
    TripleDb.fromTerms(spark, triples).index()
  def mergeDbs(dbs: TripleDb*): TripleDb = TripleDb.merge(dbs: _*)

  // ---- term constructors (ergonomics) ----
  def kw(name: String): Term = Term.TKeyword(name)
  def uri(u: String): Term = Term.TUri(u)
  def str(s: String): Term = Term.TString(s)
  def lng(v: Long): Term = Term.TLong(v)
  def dbl(v: Double): Term = Term.TDouble(v)
  def v(name: String): V = V(name)
}
