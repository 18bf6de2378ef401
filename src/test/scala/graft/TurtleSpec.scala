package graft

import graft.core.Term._
import graft.sources.{NTriples, Turtle}

/** Turtle subset reader/writer (sources/Turtle.scala). */
class TurtleSpec extends GraftSpec {

  private def parseStr(doc: String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ttl")
    java.nio.file.Files.write(dir.resolve("d.ttl"),
      doc.getBytes("UTF-8"))
    Turtle.load(spark, dir.toString).triples.toSet
  }

  test("turtle: prefixes, 'a', predicate/object lists, comments, " +
      "numbers, booleans, lang tags, datatypes, long strings") {
    val got = parseStr(
      """# a comment
        |@prefix gk: <urn:graft:kw/> .
        |@prefix ex: <http://ex/> .
        |PREFIX sq: <http://sq/>
        |ex:alice a ex:Person ;            # trailing comment
        |  gk:age 42 ;
        |  gk:score 2.5 , 1e2 ;
        |  gk:active true ;
        |  gk:name "Alice" , "Alize"@fr ;
        |  gk:bio '''line1
        |"quoted" line2''' ;
        |  gk:joined "2024-02-29T00:00:00"^^<http://www.w3.org/2001/XMLSchema#dateTime> ;
        |  gk:height "1.75"^^sq:meters .
        |<urn:graft:rel/row/7> gk:label "rel row" .
        |""".stripMargin)
    val alice = TUri("http://ex/alice")
    assert(got == Set(
      (alice, TUri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"),
        TUri("http://ex/Person")),
      (alice, k("age"), l(42)),
      (alice, k("score"), TDouble(2.5)),
      (alice, k("score"), TDouble(100.0)),
      (alice, k("active"), TBool(true)),
      (alice, k("name"), s("Alice")),
      (alice, k("name"), TLangString("Alize", "fr")),
      (alice, k("bio"), s("line1\n\"quoted\" line2")),
      (alice, k("joined"), TDate("2024-02-29T00:00:00")),
      (alice, k("height"), TTyped("1.75", "http://sq/meters")),
      (TUri("row/7"), k("label"), s("rel row"))))
  }

  test("turtle: long-string content may end (or begin) with quote " +
      "chars — only the final three of a quote run terminate") {
    val q = "\""
    val got = parseStr(
      s"""@prefix gk: <urn:graft:kw/> .
         |gk:a gk:p ${q * 3}abc$q${q * 3} .
         |gk:b gk:p ${q * 3}x$q$q y${q * 3} .
         |gk:c gk:p '''ends two''${"'" * 3} .
         |""".stripMargin)
    assert(got == Set(
      (k("a"), k("p"), s("abc\"")),
      (k("b"), k("p"), s("x\"\" y")),
      (k("c"), k("p"), s("ends two''"))))
  }

  test("turtle: outside-subset forms fail loudly — blank nodes, " +
      "collections, @base, undeclared prefix, unterminated literal") {
    def err(doc: String): String =
      intercept[Exception] { parseStr(doc) } match {
        case e =>
          (Option(e.getMessage) ++ Option(e.getCause).map(_.getMessage))
            .mkString(" | ")
      }
    assert(err("_:b <http://p> <http://o> .").contains("blank nodes"))
    assert(err("<http://s> <http://p> [ <http://q> 1 ] .")
      .contains("anonymous blank nodes"))
    assert(err("<http://s> <http://p> (1 2) .").contains("collections"))
    assert(err("@base <http://b/> .").contains("@base"))
    assert(err("ex:s ex:p ex:o .").contains("undeclared prefix"))
    assert(err("<http://s> <http://p> \"unterminated .")
      .contains("unterminated"))
    assert(err("<http://s> <http://p> 5").contains("expected '.'"))
  }

  test("blank-node skolemization: rejected by default; skolem mode " +
      "scopes labels per FILE (join within, never across); Turtle, " +
      "TriG graph labels, N-Quads; restore-writer round-trip") {
    val xsdLong = "http://www.w3.org/2001/XMLSchema#long"
    val dir = java.nio.file.Files.createTempDirectory("graft_bnode")
    java.nio.file.Files.write(dir.resolve("a.nt"),
      (s"""_:x <urn:graft:kw/p> "1"^^<$xsdLong> .""" + "\n" +
        """_:x <urn:graft:kw/linked> _:y .""" + "\n").getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("b.nt"),
      (s"""_:x <urn:graft:kw/p> "2"^^<$xsdLong> .""" + "\n").getBytes("UTF-8"))
    // strict default: the grammar still rejects bnode lines
    intercept[Exception] { NTriples.load(spark, dir.toString).triples }
    val d = graft.core.TripleDb(
      NTriples.load(spark, dir.toString, "skolem").df.coalesce(1))
    val tr = d.triples
    assert(tr.size == 3)
    val s1 = tr.collectFirst { case (s, _, o) if o == l(1L) => s }.get
    val s2 = tr.collectFirst { case (s, _, o) if o == l(2L) => s }.get
    val sL = tr.collectFirst { case (s, p, _) if p == k("linked") => s }.get
    assert(s1 == sL, "one file's _:x must unify within that file")
    assert(s1 != s2, "_:x in two files must stay distinct")
    assert(Seq(s1, s2).forall {
      case TUri(u0) => u0.startsWith("urn:graft:bnode/"); case _ => false })
    // restore writer: bnode-valued re-export, no skolem IRIs on disk,
    // and the reloaded store keeps the join structure
    val out = dir.resolve("out").toString
    NTriples.save(d, out, restoreBnodes = true)
    val lines = spark.read.text(out).collect().map(_.getString(0))
    assert(lines.forall(!_.contains("urn:graft:bnode")))
    assert(lines.count(_.startsWith("_:")) == 3)
    val tr2 = NTriples.load(spark, out, "skolem").triples
    assert(tr2.size == 3)
    val t1 = tr2.collectFirst { case (s, _, o) if o == l(1L) => s }.get
    val t2 = tr2.collectFirst { case (s, _, o) if o == l(2L) => s }.get
    val tL = tr2.collectFirst { case (s, p, _) if p == k("linked") => s }.get
    assert(t1 == tL && t1 != t2)
    // Turtle leg: same mapping, document-scoped
    val tdir = java.nio.file.Files.createTempDirectory("graft_bnode_ttl")
    java.nio.file.Files.write(tdir.resolve("c.ttl"),
      """@prefix gk: <urn:graft:kw/> .
        |_:b1 gk:p 5 ; gk:linked _:b2 .
        |_:b2 gk:p 6 .
        |""".stripMargin.getBytes("UTF-8"))
    intercept[Exception] { Turtle.load(spark, tdir.toString).triples }
    val ttr = Turtle.load(spark, tdir.toString, "skolem").triples
    assert(ttr.size == 3)
    val viaLink = ttr.collectFirst { case (_, p, o) if p == k("linked") => o }.get
    val asSubj = ttr.collectFirst { case (s, _, o) if o == l(6L) => s }.get
    assert(viaLink == asSubj)
    // N-Quads + TriG: bnode GRAPH labels skolemize too
    val qdir = java.nio.file.Files.createTempDirectory("graft_bnode_nq")
    java.nio.file.Files.write(qdir.resolve("e.nq"),
      (s"""<http://s> <urn:graft:kw/p> "1"^^<$xsdLong> _:g .""" + "\n")
        .getBytes("UTF-8"))
    val qd = NTriples.loadQuads(spark, qdir.toString, "skolem")
    val g = qd.quads.head._4
    assert(g match {
      case TUri(u0) => u0.startsWith("urn:graft:bnode/"); case _ => false })
    val gdir = java.nio.file.Files.createTempDirectory("graft_bnode_trig")
    java.nio.file.Files.write(gdir.resolve("f.trig"),
      """@prefix gk: <urn:graft:kw/> .
        |_:g { <http://s> gk:p 1 . _:inner gk:p 2 . }
        |""".stripMargin.getBytes("UTF-8"))
    val gq = Turtle.loadTrig(spark, gdir.toString, "skolem").quads
    assert(gq.size == 2 && gq.forall(_._4 match {
      case TUri(u0) => u0.startsWith("urn:graft:bnode/"); case _ => false }))
  }

  test("turtle round-trip: save emits self-contained per-partition docs " +
      "with gk: compression; load ≡ original; term mapping ≡ N-Triples") {
    val exotic = db(
      (k("a"), k("p"), s("tab\there\nand \"quotes\" \\ backslash")),
      (TNil, k("p"), s("nil subject")),
      (k("b"), k("p"), l(9007199254740993L)),
      (k("c"), k("p"), TDouble(-0.125)),
      (k("d"), k("p"), TLangString("héllo", "de")),
      (k("e"), k("p"), TTyped("foo>bar", "http://some/dt")),
      (k("f"), k("p"), TDate("2024-02-29T00:00:00")),
      (k("g"), k("p"), graft.core.Term.opaque("pt", Array[Byte](0, 127, -128))),
      (k("h"), k("p"), TBool(false)),
      (TUri("http://abs/iri?x=1"), k("p"), TUri("relative/row 7")),
      (k("weird kw"), k("p"), s("")))
    val tmp = java.nio.file.Files.createTempDirectory("graft_ttlrt").toString
    Turtle.save(exotic, tmp)
    assert(Turtle.load(spark, tmp).triples.toSet == exotic.triples.toSet)
    // plain keyword predicates compressed to gk: prefixed names
    val raw = spark.read.text(tmp).collect().map(_.getString(0))
    assert(raw.exists(_.contains("gk:p ")))
    // every part file self-contained: header precedes first data line
    val files = new java.io.File(tmp).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.toString)
    files.foreach { f =>
      val ls = scala.io.Source.fromFile(f, "UTF-8").getLines().toList
      assert(ls.headOption.forall(_.startsWith("@prefix gk:")), f)
    }
    // cross-format: the same db through N-Triples gives identical terms
    val tmp2 = java.nio.file.Files.createTempDirectory("graft_ttlnt").toString
    NTriples.save(exotic, tmp2)
    assert(NTriples.load(spark, tmp2).triples.toSet ==
      Turtle.load(spark, tmp).triples.toSet)
  }

  private def parseTrigStr(doc: String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_trig")
    java.nio.file.Files.write(dir.resolve("d.trig"), doc.getBytes("UTF-8"))
    Turtle.loadTrig(spark, dir.toString).quads.toSet
  }

  test("trig: GRAPH blocks, label-only blocks, bare default block, " +
      "top-level default statements; nesting the graph context") {
    import graft.core.QuadDb
    val got = parseTrigStr(
      """@prefix gk: <urn:graft:kw/> .
        |@prefix ex: <http://ex/> .
        |ex:top gk:p "default1" .
        |GRAPH ex:g1 {
        |  ex:a gk:p 1 .
        |  ex:a gk:q 2 , 3 .
        |}
        |ex:g2 { ex:b gk:p "in g2" . }
        |{ ex:c gk:p "default2" . }
        |""".stripMargin)
    val dg = QuadDb.DefaultGraph
    def ex(x: String) = TUri(s"http://ex/$x")
    assert(got == Set(
      (ex("top"), k("p"), s("default1"), dg),
      (ex("a"), k("p"), l(1), ex("g1")),
      (ex("a"), k("q"), l(2), ex("g1")),
      (ex("a"), k("q"), l(3), ex("g1")),
      (ex("b"), k("p"), s("in g2"), ex("g2")),
      (ex("c"), k("p"), s("default2"), dg)))
    // plain-Turtle load refuses TriG blocks loudly
    val err = intercept[Exception] {
      val d2 = java.nio.file.Files.createTempDirectory("graft_trig2")
      java.nio.file.Files.write(d2.resolve("d.ttl"),
        "{ <http://s> <http://p> 1 . }".getBytes("UTF-8"))
      Turtle.load(spark, d2.toString).triples
    }
    assert((Option(err.getMessage) ++
      Option(err.getCause).map(_.getMessage)).mkString.contains("TriG"))
  }

  test("trig round-trip: default graph as plain lines, named graphs as " +
      "per-row blocks; load ≡ original quad store") {
    import graft.core.QuadDb
    val store = QuadDb.fromQuads(spark, Seq(
      (k("a"), k("p"), s("v1"), QuadDb.DefaultGraph),
      (k("a"), k("p"), l(7), TUri("http://g/one")),
      (TUri("http://s/x"), k("q"), TLangString("hé\n\"x\"", "fr"),
        TUri("http://g/two")),
      (k("b"), k("weird pred"), TBool(true), TUri("http://g/one"))))
    val tmp = java.nio.file.Files.createTempDirectory("graft_trigrt").toString
    Turtle.saveTrig(store, tmp)
    assert(Turtle.loadTrig(spark, tmp).quads.toSet == store.quads.toSet)
    val raw = spark.read.text(tmp).collect().map(_.getString(0))
    // default-graph line has no block braces; named-graph lines are
    // one-statement blocks opened by the graph label
    assert(raw.filter(_.contains("\"v1\"")).forall(!_.contains("{")))
    val blocks = raw.filter(_.contains("{"))
    assert(blocks.length == 3)
    assert(blocks.forall(l => l.startsWith("<http://g/") &&
      l.endsWith("}")))
  }
}
