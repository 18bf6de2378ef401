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

/** `(values ?v coll)` — bind ?v to members of a runtime collection
  * (alpha.clj:91-105, 175-176). Bag semantics: duplicates in `coll`
  * duplicate solutions, exactly like `l/membero`.
  */
final case class Values(v: V, coll: Iterable[Term]) extends PatternRow {
  if (coll == null) throw new InvalidValues(
    s"values binding for ?${v.name} must be a collection, got null")
  def vars: Seq[V] = Seq(v)
}

/** `(optional [...])` (alpha.clj:107-124) — group may fail without
  * discarding the solution; nestable.
  */
final case class Optional(rows: Seq[PatternRow]) extends PatternRow {
  def vars: Seq[V] = rows.flatMap(_.vars).distinct
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
    rows.collect { case r: TriplePattern => r; case r: Values => r }
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
    case Values(_, coll) => coll.toSeq
    case Optional(inner) => valuesTerms(inner)
    case _               => Nil
  }
}
