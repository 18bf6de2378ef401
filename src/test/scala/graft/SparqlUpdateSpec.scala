package graft

import graft.core.{QuadDb, Term, TripleDb}
import graft.core.Term._
import graft.dsl._
import graft.sparql._

/** The SPARQL Update text grammar (graft/sparql UpdateOps): parse →
  * the op ADT → the existing Update/GraphMgmt machinery. Execution is
  * pinned ≡ calling the ops API directly. */
class SparqlUpdateSpec extends GraftSpec {

  private val gk = "PREFIX gk: <urn:graft:kw/>\n"

  private def baseQuads: Seq[(Term, Term, Term, Term)] = Seq(
    (k("a"), k("p"), l(1), u("g1")),
    (k("a"), k("seg"), s("X"), u("g1")),
    (k("b"), k("p"), l(2), u("g2")),
    (k("c"), k("p"), l(3), QuadDb.DefaultGraph))

  private def freshStore(): String = {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_supd").toString + "/store"
    QuadDb.save(QuadDb.fromQuads(spark, baseQuads), tmp)
    tmp
  }

  test("parse: every op form to the exact ADT") {
    val ops = SparqlUpdate.parse(gk +
      """INSERT DATA { gk:x gk:p 1 . GRAPH <http://g/1> { gk:y gk:q 2 . } } ;
        |DELETE DATA { gk:x gk:p 1 . } ;
        |DELETE { GRAPH ?g { ?c gk:bal ?b . } }
        |INSERT { GRAPH ?g { ?c gk:redacted true . } }
        |WHERE { GRAPH ?g { ?c gk:seg "X" . ?c gk:bal ?b . } } ;
        |INSERT { ?c gk:mark 1 . } WHERE { ?c gk:seg "X" . } ;
        |DELETE WHERE { GRAPH <http://g/2> { ?s gk:p ?o . } } ;
        |DELETE WHERE { ?s gk:p ?o } ;
        |LOAD SILENT <file:///tmp/x.nt> INTO GRAPH <http://g/3> ;
        |CLEAR GRAPH <http://g/1> ;
        |DROP DEFAULT ;
        |CLEAR ALL ;
        |CLEAR NAMED ;
        |DROP NAMED ;
        |CREATE GRAPH <http://g/9> ;
        |CREATE SILENT GRAPH <http://g/9> ;
        |COPY GRAPH <http://g/1> TO DEFAULT ;
        |MOVE DEFAULT TO GRAPH <http://g/2> ;
        |ADD GRAPH <http://g/1> TO GRAPH <http://g/2>""".stripMargin)
    val dg = T(QuadDb.DefaultGraph)
    val g1 = TUri("http://g/1"); val g2 = TUri("http://g/2")
    assert(ops == Seq(
      InsertData(Seq((k("x"), k("p"), l(1), QuadDb.DefaultGraph),
        (k("y"), k("q"), l(2), g1))),
      DeleteData(Seq((k("x"), k("p"), l(1), QuadDb.DefaultGraph))),
      Modify(
        Seq((?("c"), T(k("bal")), ?("b"), ?("g"))),
        Seq((?("c"), T(k("redacted")), T(TBool(true)), ?("g"))),
        GraphScope(?("g"), Seq(
          pat(?("c"), T(k("seg")), T(s("X"))),
          pat(?("c"), T(k("bal")), ?("b"))))),
      Modify(Nil, Seq((?("c"), T(k("mark")), T(l(1)), dg)),
        Seq(pat(?("c"), T(k("seg")), T(s("X"))))),
      Modify(Seq((?("s"), T(k("p")), ?("o"), T(g2))), Nil,
        Seq(QuadPattern(?("s"), T(k("p")), ?("o"), T(g2)))),
      // §3.1.3.2: bare DELETE WHERE rows scope to the DEFAULT graph on
      // BOTH sides — pattern and template name the same quads
      Modify(Seq((?("s"), T(k("p")), ?("o"), dg)), Nil,
        Seq(QuadPattern(?("s"), T(k("p")), ?("o"), dg))),
      LoadOp("/tmp/x.nt", TUri("http://g/3"), silent = true),
      ClearOp(Some(g1)),
      ClearOp(Some(QuadDb.DefaultGraph)),
      ClearOp(None),
      ClearNamedOp,
      ClearNamedOp, // DROP NAMED ≡ CLEAR NAMED (no empty containers)
      CreateOp(TUri("http://g/9"), silent = false),
      CreateOp(TUri("http://g/9"), silent = true),
      CopyOp(g1, QuadDb.DefaultGraph),
      MoveOp(QuadDb.DefaultGraph, g2),
      AddOp(g1, g2)))
  }

  test("print → parse round-trip on every op form") {
    val ops: Seq[UpdateOp] = Seq(
      InsertData(Seq((k("x"), k("p"), l(1), QuadDb.DefaultGraph),
        (k("y"), k("q"), s("v"), u("g1")))),
      DeleteData(Seq((k("x"), k("p"), l(1), u("g1")))),
      Modify(Seq((?("c"), T(k("bal")), ?("b"), ?("g"))),
        Seq((?("c"), T(k("red")), T(TBool(true)), ?("g"))),
        GraphScope(?("g"), Seq(pat(?("c"), T(k("bal")), ?("b"))))),
      LoadOp("/tmp/d.jsonl", u("g3")),
      LoadOp("/tmp/d.nt", QuadDb.DefaultGraph),
      LoadOp("/tmp/d.nt", u("g1"), silent = true),
      ClearOp(None), ClearOp(Some(u("g1"))),
      ClearOp(Some(QuadDb.DefaultGraph)), ClearNamedOp,
      CreateOp(u("g7"), silent = false), CreateOp(u("g7"), silent = true),
      CopyOp(u("g1"), u("g2")), MoveOp(u("g1"), QuadDb.DefaultGraph),
      AddOp(QuadDb.DefaultGraph, u("g2")))
    assert(SparqlUpdate.parse(SparqlUpdate.print(ops)) == ops)
  }

  test("run: text request ≡ the ops-API lifecycle on a durable store") {
    val store = freshStore()
    SparqlUpdate.run(spark, store, gk +
      """INSERT DATA { GRAPH <http://data/example/g1> { gk:d gk:p 9 . } } ;
        |DELETE DATA { GRAPH <http://data/example/g2> { gk:b gk:p 2 . } } ;
        |DELETE { GRAPH ?g { ?c gk:p ?b . } }
        |INSERT { GRAPH ?g { ?c gk:redacted true . } }
        |WHERE { GRAPH ?g { ?c gk:seg "X" . ?c gk:p ?b . } } ;
        |ADD GRAPH <http://data/example/g1> TO GRAPH <http://data/example/g2>""".stripMargin)
    val got = QuadDb.load(spark, store).quads.toSet
    val g1 = u("g1"); val g2 = u("g2")
    assert(got == Set(
      // a: gk:p tombstoned by the Modify, marker inserted (in g1 + added to g2)
      (k("a"), k("seg"), s("X"), g1),
      (k("a"), k("redacted"), TBool(true), g1),
      (k("d"), k("p"), l(9), g1),
      // ADD copied g1's post-mutation facts into g2 (b's fact deleted)
      (k("a"), k("seg"), s("X"), g2),
      (k("a"), k("redacted"), TBool(true), g2),
      (k("d"), k("p"), l(9), g2),
      (k("c"), k("p"), l(3), QuadDb.DefaultGraph)))
    // CLEAR ALL empties; a second DELETE DATA of an absent fact no-ops
    SparqlUpdate.run(spark, store,
      "DELETE DATA { <urn:x> <urn:y> 1 } ; CLEAR ALL")
    assert(QuadDb.load(spark, store).df.isEmpty)
  }

  test("loud errors: vars in DATA, paths in templates, unknown LOAD " +
      "format, missing ';'") {
    def err(t: String): String =
      intercept[Exception] { SparqlUpdate.parse(t) }.getMessage
    assert(err("INSERT DATA { ?x <urn:p> 1 }").contains("GROUND"))
    assert(err(gk + "DELETE { ?s gk:p+ ?o . } WHERE { ?s gk:p ?o }")
      .contains("plain triples"))
    assert(err("CLEAR ALL DROP DEFAULT").contains("';'"))
    assert(SparqlUpdate.formatOf("/tmp/x.rdf") == "rdfxml")
    assert(intercept[Exception] {
      SparqlUpdate.formatOf("/tmp/x.xyz")
    }.getMessage.contains("format"))
  }

  test("bare DELETE WHERE touches ONLY the default graph (§3.1.3.2: " +
      "pattern ≡ template — named-graph facts neither match nor die)") {
    val store = freshStore()
    SparqlUpdate.run(spark, store, gk + "DELETE WHERE { ?s gk:p ?o }")
    // only (c p 3 @default) dies; g1/g2 facts survive untouched
    assert(QuadDb.load(spark, store).quads.toSet ==
      baseQuads.toSet - ((k("c"), k("p"), l(3), QuadDb.DefaultGraph)))
  }

  test("LOAD SILENT swallows a missing document (§3.1 error " +
      "semantics); the bare form stays loud") {
    val store = freshStore()
    SparqlUpdate.run(spark, store, "LOAD SILENT <file:///no/such.nt>")
    assert(QuadDb.load(spark, store).quads.toSet == baseQuads.toSet)
    intercept[Exception] {
      SparqlUpdate.run(spark, store, "LOAD <file:///no/such.nt>")
    }
  }

  test("CLEAR NAMED empties every named graph, keeps the default; " +
      "CREATE errors on a non-empty graph unless SILENT") {
    val store = freshStore()
    val e = intercept[InvalidBgp] {
      SparqlUpdate.run(spark, store, "CREATE GRAPH <http://data/example/g1>")
    }
    assert(e.getMessage.contains("already exists"))
    // SILENT and fresh-graph forms both no-op cleanly
    SparqlUpdate.run(spark, store,
      "CREATE SILENT GRAPH <http://data/example/g1> ; " +
        "CREATE GRAPH <urn:fresh>")
    SparqlUpdate.run(spark, store, "CLEAR NAMED")
    assert(QuadDb.load(spark, store).quads.toSet ==
      Set((k("c"), k("p"), l(3), QuadDb.DefaultGraph)))
    // a second CLEAR NAMED no-ops (probe: no live named-graph quads)
    SparqlUpdate.run(spark, store, "DROP NAMED")
    assert(QuadDb.load(spark, store).quads.toSet ==
      Set((k("c"), k("p"), l(3), QuadDb.DefaultGraph)))
  }
}
