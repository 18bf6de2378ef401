package graft

import graft.core.Term._
import graft.sources.{NTriples, RdfXml}

/** RDF/XML subset reader/writer (sources/RdfXml.scala). */
class RdfXmlSpec extends GraftSpec {

  private def parseStr(doc: String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_rdfxml")
    java.nio.file.Files.write(dir.resolve("d.rdf"), doc.getBytes("UTF-8"))
    RdfXml.load(spark, dir.toString).triples.toSet
  }

  private val RdfRdf =
    """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      |         xmlns:gk="urn:graft:kw/" xmlns:sdo="http://schema.org/">""".stripMargin

  test("rdfxml: node elements, typed nodes, property elements " +
      "(resource/datatype/lang), property attributes, xml:lang scope") {
    val got = parseStr(RdfRdf + """
      |<rdf:Description rdf:about="urn:graft:kw/alice" sdo:nick="Al">
      |  <gk:age rdf:datatype="http://www.w3.org/2001/XMLSchema#long">42</gk:age>
      |  <gk:score rdf:datatype="http://www.w3.org/2001/XMLSchema#double">-0.125</gk:score>
      |  <sdo:name>Alice</sdo:name>
      |  <sdo:knows rdf:resource="urn:graft:kw/bob"/>
      |  <rdf:type rdf:resource="http://schema.org/Person"/>
      |</rdf:Description>
      |<sdo:Person rdf:about="urn:graft:rel/p/7" xml:lang="de">
      |  <sdo:name>Jürgen</sdo:name>
      |  <sdo:alias xml:lang="">plain</sdo:alias>
      |  <gk:ok rdf:datatype="http://www.w3.org/2001/XMLSchema#boolean">true</gk:ok>
      |</sdo:Person>
      |</rdf:RDF>""".stripMargin)
    val rdfType = TUri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
    assert(got == Set(
      (k("alice"), TUri("http://schema.org/nick"), s("Al")),
      (k("alice"), k("age"), l(42)),
      (k("alice"), k("score"), TDouble(-0.125)),
      (k("alice"), TUri("http://schema.org/name"), s("Alice")),
      (k("alice"), TUri("http://schema.org/knows"), k("bob")),
      (k("alice"), rdfType, TUri("http://schema.org/Person")),
      (TUri("p/7"), rdfType, TUri("http://schema.org/Person")),
      (TUri("p/7"), TUri("http://schema.org/name"),
        TLangString("Jürgen", "de")),
      (TUri("p/7"), TUri("http://schema.org/alias"), s("plain")),
      (TUri("p/7"), k("ok"), TBool(true))))
  }

  test("rdfxml: outside-subset forms fail loudly — parseType, nodeID, " +
      "missing rdf:about, nested nodes, containers, xml:base, DTDs, " +
      "stray text, relative IRIs") {
    def err(doc: String): String =
      intercept[Exception] { parseStr(doc) } match {
        case e => (Option(e.getMessage) ++
          Option(e.getCause).map(_.getMessage)).mkString(" | ")
      }
    def in(body: String) = RdfRdf + "\n" + body + "\n</rdf:RDF>"
    assert(err(in("""<rdf:Description rdf:about="urn:x"
      |<gk:p rdf:parseType="Literal"><b>x</b></gk:p>
      |</rdf:Description>""".stripMargin)).contains("malformed XML"))
    assert(err(in("""<rdf:Description rdf:about="urn:x">
      |<gk:p rdf:parseType="Resource"/>
      |</rdf:Description>""".stripMargin)).contains("parseType"))
    assert(err(in("""<rdf:Description rdf:nodeID="b0">
      |<gk:p>1</gk:p></rdf:Description>""".stripMargin))
      .contains("nodeID"))
    assert(err(in("""<rdf:Description><gk:p>1</gk:p></rdf:Description>"""))
      .contains("rdf:about"))
    assert(err(in("""<rdf:Description rdf:about="urn:x">
      |<gk:p><rdf:Description rdf:about="urn:y"/></gk:p>
      |</rdf:Description>""".stripMargin)).contains("flatten"))
    assert(err(in("""<rdf:Bag rdf:about="urn:x"/>"""))
      .contains("outside the subset"))
    assert(err(in("""<rdf:Description rdf:about="urn:x">
      |<rdf:li>1</rdf:li></rdf:Description>""".stripMargin))
      .contains("container"))
    assert(err(in("""<rdf:Description rdf:about="urn:x" xml:base="http://b/">
      |<gk:p>1</gk:p></rdf:Description>""".stripMargin)).contains("base"))
    assert(err("""<?xml version="1.0"?><!DOCTYPE rdf:RDF [<!ENTITY x "y">]>
      |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"/>
      |""".stripMargin).contains("malformed XML"))
    assert(err(in("""<rdf:Description rdf:about="urn:x">stray
      |<gk:p>1</gk:p></rdf:Description>""".stripMargin))
      .contains("stray text"))
    assert(err(in("""<rdf:Description rdf:about="relative/only">
      |<gk:p>1</gk:p></rdf:Description>""".stripMargin))
      .contains("absolute IRI"))
    assert(err(in("""<rdf:Description rdf:about="urn:x" plain="v">
      |<gk:p>1</gk:p></rdf:Description>""".stripMargin))
      .contains("namespace"))
  }

  test("rdfxml round-trip: save emits self-contained per-partition " +
      "documents; load ≡ original; term mapping ≡ N-Triples (the " +
      "cross-format pin)") {
    val exotic = db(
      (k("a"), k("p"), s("tab\there and \"quotes\" & <angles>")),
      (TNil, k("p"), s("nil subject")),
      (k("b"), k("p"), l(9007199254740993L)),
      (k("c"), k("p"), TDouble(-0.125)),
      (k("d"), k("p"), TLangString("héllo", "de")),
      (k("e"), k("p"), TTyped("foo>bar", "http://some/dt")),
      (k("f"), k("p"), TDate("2024-02-29T00:00:00")),
      (k("g"), k("p"), graft.core.Term.opaque("pt", Array[Byte](0, 127, -128))),
      (k("h"), k("p"), TBool(false)),
      (TUri("http://abs/iri?x=1"), k("p"), TUri("relative/row 7")),
      (k("i"), k("foaf/knows"), TNil),
      (k("weird kw"), k("p"), s("")))
    val tmp = java.nio.file.Files.createTempDirectory("graft_xmlrt").toString
    RdfXml.save(exotic, tmp)
    assert(RdfXml.load(spark, tmp).triples.toSet == exotic.triples.toSet)
    // every part file is a self-contained document
    val files = new java.io.File(tmp).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.toString)
    files.foreach { f =>
      val ls = scala.io.Source.fromFile(f, "UTF-8").getLines().toList
      assert(ls.headOption.forall(_.startsWith("<?xml")), f)
      assert(ls.isEmpty || ls.last == "</rdf:RDF>", f)
    }
    // cross-format: the same db through N-Triples gives identical terms
    val tmp2 = java.nio.file.Files.createTempDirectory("graft_xmlnt").toString
    NTriples.save(exotic, tmp2)
    assert(NTriples.load(spark, tmp2).triples.toSet ==
      RdfXml.load(spark, tmp).triples.toSet)
    // XML-unrepresentable control characters refuse loudly at write
    val e = intercept[Exception] {
      RdfXml.save(db((k("x"), k("p"), s("bad" + '\u0001' + "nul"))),
        java.nio.file.Files.createTempDirectory("graft_xmlbad").toString)
    }
    // Spark wraps task failures several levels deep — walk the chain
    var t: Throwable = e
    var found = false
    while (t != null && !found) {
      found = Option(t.getMessage).exists(_.contains("control character"))
      t = t.getCause
    }
    assert(found, e.getMessage)
  }
}
