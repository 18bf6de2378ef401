package graft

import graft.core.{QuadDb, Term, TripleDb}
import graft.core.Term._
import graft.ops.GraphMgmt

/** SPARQL Update §3.2 graph management (ops/GraphMgmt): value forms
  * over [[QuadDb]]s and durable delta forms over saved stores. */
class GraphMgmtSpec extends GraftSpec {

  private val g1 = u("g1")
  private val g2 = u("g2")
  private val g3 = u("g3")

  private def base: QuadDb = QuadDb.fromQuads(spark, Seq(
    (k("a"), k("p"), l(1), g1),
    (k("a"), k("p"), l(2), g1),
    (k("b"), k("q"), l(3), g2),
    (k("a"), k("p"), l(1), g2), // same triple as g1's — distinct fact
    (k("c"), k("r"), l(4), QuadDb.DefaultGraph)))

  private def quadSet(db: QuadDb) = db.quads.toSet

  test("value forms: CLEAR/DROP, CLEAR DEFAULT/ALL, COPY, MOVE, ADD — " +
      "spec semantics incl. from == to no-ops and no duplicate facts") {
    val d = base
    assert(quadSet(GraphMgmt.clear(d, g1)) ==
      quadSet(d).filterNot(_._4 == g1))
    assert(quadSet(GraphMgmt.clearDefault(d)) ==
      quadSet(d).filterNot(_._4 == QuadDb.DefaultGraph))
    assert(quadSet(GraphMgmt.clearAll(d)).isEmpty)
    // COPY: destination replaced by the source's data; source kept
    val copied = GraphMgmt.copy(d, g1, g2)
    assert(quadSet(copied) == Set(
      (k("a"), k("p"), l(1), g1), (k("a"), k("p"), l(2), g1),
      (k("a"), k("p"), l(1), g2), (k("a"), k("p"), l(2), g2),
      (k("c"), k("r"), l(4), QuadDb.DefaultGraph)))
    // MOVE: as COPY, source dropped
    val moved = GraphMgmt.move(d, g1, g2)
    assert(quadSet(moved) == Set(
      (k("a"), k("p"), l(1), g2), (k("a"), k("p"), l(2), g2),
      (k("c"), k("r"), l(4), QuadDb.DefaultGraph)))
    // ADD: union into the destination, shared facts NOT duplicated
    val added = GraphMgmt.add(d, g1, g2)
    assert(quadSet(added) == quadSet(d) ++ Set(
      (k("a"), k("p"), l(2), g2))) // (a p 1) was already in g2
    assert(added.df.count() == d.df.count() + 1) // bag-level: no dupes
    // from == to: no-ops per spec
    assert(quadSet(GraphMgmt.copy(d, g1, g1)) == quadSet(d))
    assert(quadSet(GraphMgmt.move(d, g1, g1)) == quadSet(d))
    assert(quadSet(GraphMgmt.add(d, g1, g1)) == quadSet(d))
    // clearing an absent graph is a no-op (no graph containers)
    assert(quadSet(GraphMgmt.clear(d, g3)) == quadSet(d))
  }

  test("value LOAD INTO GRAPH: document triples merge into the graph " +
      "set-semantically") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_gm_nt").toString
    graft.sources.NTriples.save(db(
      (k("a"), k("p"), l(1)), // already asserted in g1
      (k("x"), k("y"), l(9))), tmp)
    val loaded = GraphMgmt.load(base, spark, tmp, "ntriples", g1)
    assert(quadSet(loaded) == quadSet(base) + ((k("x"), k("y"), l(9), g1)))
    assert(loaded.df.count() == base.df.count() + 1)
    intercept[IllegalArgumentException] {
      GraphMgmt.readTriples(spark, tmp, "xml")
    }
  }

  test("durable lifecycle: LOAD INTO staging → ADD to live → MOVE to " +
      "archive → DROP archive ≡ a store built directly; deltas only") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_gm_dur").toString
    val store = s"$tmp/store"
    QuadDb.save(base, store)
    // the document: one fact already live in g1, one novel
    val ntDir = s"$tmp/nt"
    graft.sources.NTriples.save(db(
      (k("a"), k("p"), l(1)), (k("x"), k("y"), l(9))), ntDir)
    val staging = u("staging"); val live = u("live"); val archive = u("archive")
    GraphMgmt.loadInto(spark, store, ntDir, "ntriples", staging)
    GraphMgmt.addGraph(spark, store, staging, live)
    GraphMgmt.moveGraph(spark, store, staging, archive)
    GraphMgmt.dropGraph(spark, store, archive)
    val got = quadSet(QuadDb.load(spark, store))
    assert(got == quadSet(base) ++ Set(
      (k("a"), k("p"), l(1), live), (k("x"), k("y"), l(9), live)))
    // staging and archive are gone
    assert(!got.exists(q => q._4 == staging || q._4 == archive))
    // durable COPY overwrites the destination graph
    GraphMgmt.copyGraph(spark, store, g1, live)
    val afterCopy = quadSet(QuadDb.load(spark, store))
    assert(afterCopy.filter(_._4 == live) == Set(
      (k("a"), k("p"), l(1), live), (k("a"), k("p"), l(2), live)))
    assert(afterCopy.filter(_._4 == g1) ==
      quadSet(base).filter(_._4 == g1)) // source kept
    // compaction reclaims the tombstoned graphs physically; loads agree
    QuadDb.compact(spark, store)
    assert(quadSet(QuadDb.load(spark, store)) == afterCopy)
  }

  test("durable MOVE (batched, round 16): one data append + one " +
      "tombstone append — overlapping destination rows survive, " +
      "replaced rows and the whole source are tombstoned, value-form " +
      "parity, empty-source MOVE clears the destination") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_gm_mv").toString
    val store = s"$tmp/store"
    QuadDb.save(base, store)
    // g1 = {(a p 1) (a p 2)}, g2 = {(b q 3) (a p 1)}: (a p 1) overlaps
    GraphMgmt.moveGraph(spark, store, g1, g2)
    val got = quadSet(QuadDb.load(spark, store))
    // ≡ the value-form MOVE on the same data
    assert(got == quadSet(GraphMgmt.move(base, g1, g2)))
    assert(got == Set(
      (k("a"), k("p"), l(1), g2), (k("a"), k("p"), l(2), g2),
      (k("c"), k("r"), l(4), QuadDb.DefaultGraph)))
    // MOVE from a graph with no live quads clears the destination
    // (value-form semantics: to := from's — empty — data)
    GraphMgmt.moveGraph(spark, store, g3, g2)
    val cleared = quadSet(QuadDb.load(spark, store))
    assert(cleared == Set((k("c"), k("r"), l(4), QuadDb.DefaultGraph)))
    // from == to: no-op
    GraphMgmt.moveGraph(spark, store, g3, g3)
    assert(quadSet(QuadDb.load(spark, store)) == cleared)
    // compaction agrees (tombstones were well-formed)
    QuadDb.compact(spark, store)
    assert(quadSet(QuadDb.load(spark, store)) == cleared)
  }
}
