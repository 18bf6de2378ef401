package graft

import graft.core.Term._
import graft.dsl._
import graft.engine.Projections
import graft.engine.Projections.UriKey

/** Ports of the reference's construct/build tests
  * (alpha_test.clj:115-249, 611-687).
  */
class ConstructBuildSpec extends GraftSpec {

  test("construct rick: magic key groups, multi-values become sets (T:117-124)") {
    val r = Projections.construct(friends,
      Map[Any, Any](UriKey -> rick, ?("p2") -> ?("o2")),
      Seq(pat(T(rick), ?("p2"), ?("o2"))))
    assert(r == Seq(Map(
      UriKey -> rick,
      label -> s("Rick"),
      knows -> Set(martin, katie))))
  }

  test("construct grouping: a value merged from >=2 solutions becomes a set (A:500-516)") {
    // martin has two labels, so (rick knows martin) arises twice; the
    // reference wraps the merged ?o in a set even though it's one
    // distinct value — construct never flattens merged sets
    val d = db(
      (rick, knows, martin),
      (martin, label, s("M1")),
      (martin, label, s("M2")))
    val r = Projections.construct(d,
      Map[Any, Any](UriKey -> ?("s2"), knows -> ?("o2")),
      Seq(pat(?("s2"), T(knows), ?("o2")), pat(?("o2"), T(label), ?("n"))))
    assert(r == Seq(Map(UriKey -> rick, knows -> Set(martin))))
  }

  test("construct returns nothing when no matches (T:126-131)") {
    val d = db((k("a"), k("b"), k("c")), (k("d"), k("e"), k("f")))
    val r = Projections.construct(d, Seq(?("p2"), ?("o2")),
      Seq(pat(T(k("not-matching")), ?("p2"), ?("o2"))))
    assert(r.isEmpty)
  }

  test("nil is matchable; bare-var template yields scalars (T:133-138)") {
    val d = db((TNil, k("label"), s("nil label")))
    val r = Projections.construct1(d, ?("label2"),
      Seq(pat(T(TNil), T(k("label")), ?("label2"))))
    assert(r.contains(s("nil label")))
  }

  test("construct nested map template groups top-level only (T:140-149)") {
    val r = Projections.construct(friends,
      Map[Any, Any](UriKey -> rick,
        knows -> Map[Any, Any](UriKey -> ?("p2"), label -> ?("name"))),
      Seq(
        pat(T(rick), T(knows), ?("p2")),
        pat(?("p2"), T(label), ?("name"))))
    assert(r == Seq(Map(
      UriKey -> rick,
      knows -> Set(
        Map(UriKey -> martin, label -> s("Martin")),
        Map(UriKey -> katie, label -> s("Katie"))))))
  }

  test("construct vector template emits triples (T:151-157)") {
    val r = Projections.construct(friends, Seq(?("s2"), ?("p2"), ?("o2")),
      Seq(pat(?("s2"), ?("p2"), ?("o2")))).toSet
    assert(r == Set(
      Seq(rick, label, s("Rick")), Seq(martin, label, s("Martin")),
      Seq(katie, label, s("Katie")), Seq(julie, label, s("Julie")),
      Seq(rick, knows, martin), Seq(rick, knows, katie),
      Seq(katie, knows, julie)))
  }

  test("construct single-var vector template (T:159-163)") {
    val r = Projections.construct(friends, Seq(?("s2")),
      Seq(pat(?("s2"), ?("p2"), ?("o2")))).toSet
    assert(r == Set(Seq(rick), Seq(martin), Seq(katie), Seq(julie)))
  }

  test("construct set template (T:165-170)") {
    val r = Projections.construct(friends, Set[Any](?("s2"), ?("p2"), ?("o2")),
      Seq(pat(?("s2"), ?("p2"), ?("o2")))).toSet
    val expected = Set(
      Set[Any](rick, label, s("Rick")), Set[Any](martin, label, s("Martin")),
      Set[Any](katie, label, s("Katie")), Set[Any](julie, label, s("Julie")),
      Set[Any](rick, knows, martin), Set[Any](rick, knows, katie),
      Set[Any](katie, knows, julie))
    assert(r == expected)
  }

  test("construct arbitrary nested datastructure (T:172-180)") {
    val r = Projections.construct(friends,
      Seq(k("foo"), Set[Any](Seq(l(1), l(2), ?("p2"), ?("o2")))),
      Seq(pat(T(rick), ?("p2"), ?("o2")))).toSet
    assert(r == Set(
      Seq(k("foo"), Set[Any](Seq(l(1), l(2), knows, katie))),
      Seq(k("foo"), Set[Any](Seq(l(1), l(2), knows, martin))),
      Seq(k("foo"), Set[Any](Seq(l(1), l(2), label, s("Rick"))))))
  }

  test("plain map template (no magic key) emits one map per solution (T:182-194)") {
    val r = Projections.construct(friends,
      Map[Any, Any](k("subject") -> ?("s2"), ?("p2") -> ?("o2")),
      Seq(pat(?("s2"), ?("p2"), ?("o2")))).toSet
    assert(r.size == 7)
    assert(r.contains(Map(k("subject") -> rick, label -> s("Rick"))))
    assert(r.contains(Map(k("subject") -> katie, knows -> julie)))
  }

  test("construct with magic key ?s groups per subject (T:196-209)") {
    val r = Projections.construct(friends,
      Map[Any, Any](UriKey -> ?("s2"), ?("p2") -> ?("o2")),
      Seq(pat(?("s2"), ?("p2"), ?("o2")))).toSet
    assert(r == Set(
      Map(UriKey -> martin, label -> s("Martin")),
      Map(UriKey -> rick, knows -> Set(martin, katie), label -> s("Rick")),
      Map(UriKey -> julie, label -> s("Julie")),
      Map(UriKey -> katie, knows -> julie, label -> s("Katie"))))
  }

  test("build with unbound subject and var keys (T:611-629)") {
    val d = db(
      (k("s"), k("p"), k("o")),
      (k("s"), k("p2"), k("o2")),
      (k("s2"), k("p"), k("o3")))
    val r = Projections.build(d, ?("s9"), Map[Any, Any](?("p9") -> ?("o9")),
      Seq(pat(?("s9"), ?("p9"), ?("o9")))).toSet
    assert(r == Set(
      Map(UriKey -> k("s"), k("p") -> k("o"), k("p2") -> k("o2")),
      Map(UriKey -> k("s2"), k("p") -> k("o3"))))
  }

  test("build with hardcoded subject (T:642-650)") {
    val d = db(
      (k("s"), k("p"), k("o")),
      (k("s"), k("p2"), k("o2")),
      (k("s2"), k("p"), k("o3")))
    val r = Projections.build(d, T(k("s")), Map[Any, Any](?("p9") -> ?("o9")),
      Seq(pat(T(k("s")), ?("p9"), ?("o9")))).toSet
    assert(r == Set(Map(UriKey -> k("s"), k("p") -> k("o"), k("p2") -> k("o2"))))
  }

  test("build optionals + grouping: multi-set, flatten, drop (T:652-673)") {
    val d = db(
      (k("s"), k("label"), s("s")),
      (k("s"), k("label"), s("s another")),
      (k("s"), k("p2"), k("o2")),
      (k("s"), k("optional"), s("optional")),
      (k("s2"), k("label"), s("s2")),
      (k("s2"), k("p2"), k("o2")))
    val r = Projections.build(d, ?("s9"),
      Map[Any, Any](k("label") -> ?("label2"), k("optional") -> ?("opt")),
      Seq(
        pat(?("s9"), T(k("label")), ?("label2")),
        Optional(Seq(pat(?("s9"), T(k("optional")), ?("opt")))))).toSet
    assert(r == Set(
      Map(UriKey -> k("s"), k("label") -> Set(s("s"), s("s another")),
        k("optional") -> s("optional")),
      Map(UriKey -> k("s2"), k("label") -> s("s2"))))
  }

  test("build-1 with values-restricted subject (T:675-687)") {
    val d = db(
      (k("s"), k("p"), k("o")),
      (k("s"), k("p2"), k("o2")),
      (k("s"), k("p2"), k("o3")),
      (k("s2"), k("p"), k("o")),
      (k("s2"), k("p2"), k("o2")))
    val r = Projections.build1(d, ?("s9"), Map[Any, Any](?("p9") -> ?("o9")),
      Seq(
        Values(?("s9"), Seq(k("s"))),
        pat(?("s9"), ?("p9"), ?("o9"))))
    assert(r.contains(Map(UriKey -> k("s"),
      k("p2") -> Set(k("o2"), k("o3")), k("p") -> k("o"))))
  }

  test("build with an all-ground template emits the constant per subject") {
    val d = db(
      (k("s"), k("p"), k("o")),
      (k("s2"), k("p"), k("o3")))
    val r = Projections.build(d, ?("s9"), Map[Any, Any](k("type") -> k("person")),
      Seq(pat(?("s9"), T(k("p")), ?("o9")))).toSet
    assert(r == Set(
      Map(UriKey -> k("s"), k("type") -> k("person")),
      Map(UriKey -> k("s2"), k("type") -> k("person"))))
  }

  test("merged duplicate facts stay deduped through the predicate index") {
    // regression: merge() must dedup per-predicate slices even when a
    // slice comes from a single source db that itself carries dups
    import org.apache.spark.sql.functions.col
    val wide = spark.createDataFrame(Seq((1L, "x"), (1L, "x"))).toDF("id", "val")
    val dup = graft.core.TripleDb.fromWideTable(wide, "t", "id")
    val merged = graft.core.TripleDb.merge(dup)
    val viaSlice = bag(merged, Seq(?("s9"), ?("o9")),
      Seq(pat(?("s9"), T(k("val")), ?("o9")))) // routes through the slice
    assert(viaSlice.values.forall(_ == 1), s"slice returned dups: $viaSlice")
  }

  test("build with custom subject key (T:697-716 shape)") {
    val d = db((k("s"), k("p"), k("o")))
    val r = Projections.build(d, ?("s9"), Map[Any, Any](k("p") -> ?("o9")),
      Seq(pat(?("s9"), T(k("p")), ?("o9"))), subjKey = k("id"))
    assert(r == Seq(Map(k("id") -> k("s"), k("p") -> k("o"))))
  }
}
