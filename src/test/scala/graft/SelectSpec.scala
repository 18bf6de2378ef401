package graft

import graft.api.Matcha
import graft.core.TripleDb
import graft.core.Term._
import graft.dsl._
import graft.engine.Projections

/** Ports of the reference's select tests (alpha_test.clj:47-113,
  * 211-231, 253-264, 362-398) as multiset comparisons.
  */
class SelectSpec extends GraftSpec {

  test("select arity-1 projects all vars; 1-var unwraps to scalar (T:54-57)") {
    val r = Matcha.select(Seq(pat(T(rick), T(label), ?("name"))), friends)
    assert(r == Seq(s("Rick")))
  }

  test("select 2-pattern join: rick knows (T:58-65)") {
    val r = Matcha.select(Seq(?("name")), Seq(
      pat(T(rick), T(knows), ?("p2")),
      pat(?("p2"), T(label), ?("name"))), friends)
    assert(r.toSet == Set(s("Martin"), s("Katie")))
  }

  test("select 2-var: katie knows (T:66-72)") {
    val r = resultSet(friends, Seq(?("p2"), ?("name")), Seq(
      pat(T(katie), T(knows), ?("p2")),
      pat(?("p2"), T(label), ?("name"))))
    assert(r == Set(Seq(julie, s("Julie"))))
  }

  test("friend of friend is a 2-hop self-join (T:74-81)") {
    val r = resultSet(friends, Seq(?("p1"), ?("p2"), ?("p3")), Seq(
      pat(?("p1"), T(knows), ?("p2")),
      pat(?("p2"), T(knows), ?("p3"))))
    assert(r == Set(Seq(rick, katie, julie)))
  }

  test("select-1 returns one solution from the solution set (T:83-113)") {
    val r = Projections.select1(friends, Seq(
      pat(T(rick), T(knows), ?("p2")),
      pat(?("p2"), T(label), ?("name"))), Seq(?("name")))
    assert(r.isDefined && Set(Seq(s("Martin")), Seq(s("Katie"))).contains(r.get))
  }

  test("select-1 on an empty match returns None") {
    val r = Projections.select1(friends, Seq(
      pat(T(julie), T(knows), ?("p2"))), Seq(?("p2")))
    assert(r.isEmpty)
  }

  test("bag semantics: duplicate solutions are not deduped (SURVEY §2.2)") {
    val d = db(
      (k("a"), k("cat"), s("x")),
      (k("b"), k("cat"), s("x")))
    val r = bag(d, Seq(?("v")), Seq(pat(?("o"), T(k("cat")), ?("v"))))
    assert(r == Map(Seq(s("x")) -> 2))
  }

  test("repeated var within a pattern is an intra-row equality filter") {
    val d = db(
      (k("a"), k("likes"), k("a")),
      (k("a"), k("likes"), k("b")))
    val r = resultSet(d, Seq(?("x")), Seq(pat(?("x"), k("likes"), ?("x"))))
    assert(r == Set(Seq(k("a"))))
  }

  test("fully-ground pattern acts as an existence gate") {
    val d = db((k("a"), k("b"), k("c")), (k("x"), k("y"), k("z")))
    val hit = resultSet(d, Seq(?("s")), Seq(
      pat(?("s"), k("y"), k("z")),
      pat(k("a"), k("b"), k("c"))))
    assert(hit == Set(Seq(k("x"))))
    val miss = resultSet(d, Seq(?("s")), Seq(
      pat(?("s"), k("y"), k("z")),
      pat(k("a"), k("b"), k("nope"))))
    assert(miss.isEmpty)
  }

  test("projecting a var bound by no pattern yields unbound (null) — T:792") {
    val r = Projections.select(friends, Seq(pat(T(rick), T(label), ?("name"))),
      Seq(?("name"), ?("nope")))
    assert(r == Seq(Seq(s("Rick"), null)))
  }

  test("empty BGP throws InvalidBgp") {
    intercept[InvalidBgp] { Projections.select(friends, Seq.empty) }
  }

  test("prepared-fn arity ≡ immediate arity for every query type (T:362-398)") {
    val bgp = Seq(pat(T(rick), T(knows), ?("p")), pat(?("p"), T(label), ?("name")))
    assert(Matcha.select(Seq(?("name")), bgp)(friends).toSet ==
      Matcha.select(Seq(?("name")), bgp, friends).toSet)
    assert(Matcha.ask(bgp)(friends) == Matcha.ask(bgp, friends))
    assert(Matcha.construct(Map(k("knows") -> ?("name")), bgp)(friends).toSet ==
      Matcha.construct(Map(k("knows") -> ?("name")), bgp, friends).toSet)
    assert(Matcha.build(?("s2"), Map(k("n") -> ?("name")),
        Seq(pat(?("s2"), T(label), ?("name"))))(friends).toSet ==
      Matcha.build(?("s2"), Map(k("n") -> ?("name")),
        Seq(pat(?("s2"), T(label), ?("name"))), friends).toSet)
  }

  test("ask true/false (T:339-360) with no-qvar ground ask") {
    assert(Matcha.ask(Seq(pat(T(rick), T(knows), ?("p"))), friends))
    assert(!Matcha.ask(Seq(pat(T(julie), T(knows), ?("p"))), friends))
    assert(Matcha.ask(Seq(pat(T(rick), T(knows), T(martin))), friends))
  }

  test("100k-triple scale smoke: 2-pattern select (T:253-264)") {
    val big = (0 until 100000).map(i => (u((i - 1).toString), knows, u(i.toString)))
    val d = TripleDb.fromTerms(spark, friends_++(big)).index()
    val r = Matcha.select(Seq(?("name")), Seq(
      pat(T(rick), T(knows), ?("p2")),
      pat(?("p2"), T(label), ?("name"))), d)
    assert(r.toSet == Set(s("Martin"), s("Katie")))
    d.unpersist()
  }

  private def friends_++(extra: Seq[(graft.core.Term, graft.core.Term, graft.core.Term)]) =
    Seq(
      (rick, label, s("Rick")), (martin, label, s("Martin")),
      (katie, label, s("Katie")), (julie, label, s("Julie")),
      (rick, knows, martin), (rick, knows, katie), (katie, knows, julie)
    ) ++ extra
}
