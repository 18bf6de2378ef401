package graft

import graft.core.Term
import graft.core.Term._
import graft.dsl._
import graft.engine.Projections

/** Ports of the reference's optional-semantics block
  * (alpha_test.clj:467-577, 689-716, 741-807). The reference reifies
  * unbound vars as `_N` symbols; we map them to null (SURVEY §2.3).
  */
class OptionalSpec extends GraftSpec {

  val other: Term = u("other-label")

  def optionalFriends: core.TripleDb = db(
    (rick, label, s("Rick")),
    (martin, label, s("Martin")),
    (katie, label, s("Katie")),
    (julie, other, s("Not a robot")),
    (rick, knows, martin),
    (rick, knows, katie),
    (katie, knows, julie),
    (s("Martin"), k("name/backwards"), s("Nitram")),
    (s("Katie"), k("name/backwards"), s("Eitak")),
    (s("Rick"), k("name/backwards"), s("Kcir")))

  val tiny: Seq[(Term, Term, Term)] = Seq((k("a"), k("triple"), k("here")))

  test("optional-only query over matching db yields solutions (T:470-475)") {
    val r = resultSet(db(tiny: _*), Seq(?("s2"), ?("p2"), ?("o2")),
      Seq(Optional(Seq(pat(?("s2"), ?("p2"), ?("o2"))))))
    assert(r == Set(Seq(k("a"), k("triple"), k("here"))))
  }

  test("optional-only query with no match yields nothing (T:477-479)") {
    val r = resultSet(db(tiny: _*), Seq(?("s2"), ?("p2"), ?("o2")),
      Seq(Optional(Seq(pat(T(k("do")), T(k("not")), T(k("match")))))))
    assert(r.isEmpty)
  }

  test("failing optional keeps the required solution (T:481-487)") {
    val r = resultSet(db(tiny: _*), Seq(?("s2"), ?("p2"), ?("o2")), Seq(
      pat(?("s2"), ?("p2"), ?("o2")),
      Optional(Seq(
        pat(T(k("optional")), T(k("doesnt")), T(k("match"))),
        pat(T(k("but")), T(k("required-pattern")), T(k("does")))))))
    assert(r == Set(Seq(k("a"), k("triple"), k("here"))))
  }

  test("optional repeating the required pattern does not multiply (T:489-494)") {
    val r = bag(db(tiny: _*), Seq(?("s2"), ?("p2"), ?("o2")), Seq(
      pat(?("s2"), ?("p2"), ?("o2")),
      Optional(Seq(pat(?("s2"), ?("p2"), ?("o2"))))))
    assert(r == Map(Seq(k("a"), k("triple"), k("here")) -> 1))
  }

  test("one failing and one matching optional, no required (T:496-501)") {
    val r = resultSet(db(tiny: _*), Seq(?("s2"), ?("p2"), ?("o2")), Seq(
      Optional(Seq(
        pat(T(k("optional")), T(k("doesnt")), T(k("match"))),
        pat(T(k("but")), T(k("other-optional")), T(k("does"))))),
      Optional(Seq(pat(?("s2"), ?("p2"), ?("o2"))))))
    assert(r == Set(Seq(k("a"), k("triple"), k("here"))))
  }

  test("optional binds from the alternative label (T:503-509)") {
    val r = resultSet(optionalFriends, Seq(?("o2"), ?("name")), Seq(
      pat(T(katie), T(knows), ?("o2")),
      Optional(Seq(pat(?("o2"), T(other), ?("name"))))))
    assert(r == Set(Seq(julie, s("Not a robot"))))
  }

  test("two optionals binding the same var act as alternatives (T:511-518)") {
    val r = resultSet(optionalFriends, Seq(?("o2"), ?("name")), Seq(
      pat(T(rick), T(knows), ?("o2")),
      Optional(Seq(pat(?("o2"), T(label), ?("name")))),
      Optional(Seq(pat(?("o2"), T(other), ?("name"))))))
    assert(r == Set(Seq(martin, s("Martin")), Seq(katie, s("Katie"))))
  }

  test("independent multi-solution optionals multiply (T:520-531)") {
    val d = db(
      (k("john"), k("status"), k("online")),
      (k("john"), k("prop1"), s("A")),
      (k("john"), k("prop1"), s("B")),
      (k("john"), k("prop2"), k("x")),
      (k("john"), k("prop2"), k("y")))
    val r = resultSet(d, Seq(?("o2"), ?("p2"), ?("x2")), Seq(
      pat(?("o2"), T(k("status")), ?("status")),
      Optional(Seq(pat(?("o2"), T(k("prop1")), ?("p2")))),
      Optional(Seq(pat(?("o2"), T(k("prop2")), ?("x2"))))))
    assert(r == Set(
      Seq(k("john"), s("A"), k("x")), Seq(k("john"), s("A"), k("y")),
      Seq(k("john"), s("B"), k("x")), Seq(k("john"), s("B"), k("y"))))
  }

  test("unmatched optional yields null placeholder rows (T:533-541)") {
    val d = db(
      (k("john"), k("status"), k("online")),
      (k("john"), k("prop2"), k("x")),
      (k("john"), k("prop2"), k("y")))
    val r = resultSet(d, Seq(?("o2"), ?("p2"), ?("x2")), Seq(
      pat(?("o2"), T(k("status")), ?("status")),
      Optional(Seq(pat(?("o2"), T(k("prop1")), ?("p2")))),
      Optional(Seq(pat(?("o2"), T(k("prop2")), ?("x2"))))))
    assert(r == Set(
      Seq(k("john"), null, k("x")), Seq(k("john"), null, k("y"))))
  }

  test("optional + values (T:543-553)") {
    val r = resultSet(optionalFriends, Seq(?("o2"), ?("name")), Seq(
      pat(?("person"), T(knows), ?("o2")),
      Optional(Seq(pat(?("o2"), T(label), ?("name")))),
      Optional(Seq(pat(?("o2"), T(other), ?("name")))),
      Values(?("person"), Seq(rick, katie))))
    assert(r == Set(
      Seq(martin, s("Martin")), Seq(katie, s("Katie")),
      Seq(julie, s("Not a robot"))))
  }

  test("optional of absent property binds nothing, keeps rows (T:555-565)") {
    val r = resultSet(optionalFriends, Seq(?("o2"), ?("name")), Seq(
      pat(?("person"), T(knows), ?("o2")),
      pat(?("o2"), T(label), ?("name")),
      Optional(Seq(pat(?("o2"), T(k("who/am-i")), ?("dunno")))),
      Values(?("person"), Seq(rick, katie))))
    assert(r == Set(Seq(martin, s("Martin")), Seq(katie, s("Katie"))))
  }

  test("nested optionals with inner values (T:567-577)") {
    val r = resultSet(optionalFriends, Seq(?("o2"), ?("eman")), Seq(
      pat(?("person"), T(knows), ?("o2")),
      Optional(Seq(
        pat(?("o2"), T(label), ?("name")),
        Optional(Seq(
          pat(?("name"), T(k("name/backwards")), ?("eman")),
          Values(?("name"), Seq(s("Martin"))))))),
      Values(?("person"), Seq(rick, katie))))
    assert(r == Set(
      Seq(martin, s("Nitram")), Seq(katie, null), Seq(julie, null)))
  }

  // catalog fixture (alpha_test.clj:718-739)
  def catalog: core.TripleDb = db(
    (k("crime"), k("a"), k("dcat/Dataset")),
    (k("crime"), k("title"), s("Crime")),
    (k("crime"), k("spatial"), k("manchester")),
    (k("crime"), k("resolution"), l(50)),
    (k("crime"), k("description"), s("Has all optional fields")),
    (k("crime"), k("publisher"), k("ons")),
    (k("crime"), k("creator"), k("moj")),
    (k("operations"), k("a"), k("dcat/Dataset")),
    (k("operations"), k("title"), s("Operational Procedures")),
    (k("operations"), k("description"), s("Has one optional (creator)")),
    (k("operations"), k("creator"), k("nhs")),
    (k("deprivation"), k("a"), k("dcat/Dataset")),
    (k("deprivation"), k("title"), s("Covid")),
    (k("deprivation"), k("description"), s("Has one optional (publisher)")),
    (k("deprivation"), k("publisher"), k("dluhc")),
    (k("not-in-results"), k("a"), k("Ontology")),
    (k("not-in-results"), k("title"), s("Should not be found")))

  test("catalog: select with three optionals (T:741-762)") {
    val r = resultSet(catalog,
      Seq(?("ds"), ?("title"), ?("pub"), ?("creator"), ?("area"), ?("resolution")),
      Seq(
        pat(?("ds"), T(k("a")), T(k("dcat/Dataset"))),
        pat(?("ds"), T(k("title")), ?("title")),
        Optional(Seq(
          pat(?("ds"), T(k("spatial")), ?("area")),
          pat(?("ds"), T(k("resolution")), ?("resolution")))),
        Optional(Seq(pat(?("ds"), T(k("publisher")), ?("pub")))),
        Optional(Seq(pat(?("ds"), T(k("creator")), ?("creator"))))))
    assert(r == Set(
      Seq(k("operations"), s("Operational Procedures"), null, k("nhs"), null, null),
      Seq(k("deprivation"), s("Covid"), k("dluhc"), null, null, null),
      Seq(k("crime"), s("Crime"), k("ons"), k("moj"), k("manchester"), l(50))))
  }

  test("catalog: build with optionals drops unbound keys (T:763-790)") {
    val r = Projections.build(catalog, ?("ds"),
      Map[Any, Any](
        k("creator") -> ?("creator"), k("publisher") -> ?("pub"),
        k("spatial") -> ?("area"), k("resolution") -> ?("resolution")),
      Seq(
        pat(?("ds"), T(k("a")), T(k("dcat/Dataset"))),
        pat(?("ds"), T(k("title")), ?("title")),
        Optional(Seq(
          pat(?("ds"), T(k("spatial")), ?("area")),
          pat(?("ds"), T(k("resolution")), ?("resolution")))),
        Optional(Seq(pat(?("ds"), T(k("publisher")), ?("pub")))),
        Optional(Seq(pat(?("ds"), T(k("creator")), ?("creator"))))))
    assert(r.toSet == Set(
      Map(Projections.UriKey -> k("operations"), k("creator") -> k("nhs")),
      Map(Projections.UriKey -> k("crime"), k("spatial") -> k("manchester"),
        k("resolution") -> l(50), k("publisher") -> k("ons"),
        k("creator") -> k("moj")),
      Map(Projections.UriKey -> k("deprivation"), k("publisher") -> k("dluhc"))))
  }

  test("values generator + optionals, no required pattern (T:792-807)") {
    val r = resultSet(catalog,
      Seq(?("ds"), ?("pub"), ?("creator"), ?("area"), ?("resolution")),
      Seq(
        Values(?("ds"), Seq(k("crime"), k("deprivation"))),
        Optional(Seq(
          pat(?("ds"), T(k("spatial")), ?("area")),
          pat(?("ds"), T(k("resolution")), ?("resolution")))),
        Optional(Seq(pat(?("ds"), T(k("publisher")), ?("pub")))),
        Optional(Seq(pat(?("ds"), T(k("creator")), ?("creator"))))))
    assert(r == Set(
      Seq(k("crime"), k("ons"), k("moj"), k("manchester"), l(50)),
      Seq(k("deprivation"), k("dluhc"), null, null, null)))
  }

  test("issue-21: optional order does not matter (T:689-716)") {
    val d = db(
      (l(1), k("p"), k("a")),
      (l(1), k("p2"), k("X")),
      (l(1), k("p3"), k("Z")),
      (l(3), k("q"), k("x")))
    def run(first: String, second: String) =
      Projections.build(d, ?("id"),
        Map[Any, Any](k("id") -> ?("id"), k("optional-a") -> ?("oa"),
          k("optional-b") -> ?("ob")),
        Seq(
          pat(?("id"), T(k("p")), ?("o2")),
          Optional(Seq(pat(?("id"), T(k(first)), ?(if (first == "p2") "oa" else "ob")))),
          Optional(Seq(pat(?("id"), T(k(second)), ?(if (second == "p2") "oa" else "ob"))))),
        subjKey = k("key")).toSet
    val ab = run("p2", "p3")
    val ba = run("p3", "p2")
    assert(ab == ba)
    assert(ab == Set(Map(k("key") -> l(1), k("id") -> l(1),
      k("optional-a") -> k("X"), k("optional-b") -> k("Z"))))
  }
}
