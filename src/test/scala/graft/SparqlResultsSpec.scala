package graft

import graft.core.{Term, TripleDb}
import graft.core.Term._
import graft.dsl._
import graft.engine.Projections
import graft.sources.SparqlResults
import org.apache.spark.sql.DataFrame

/** W3C SPARQL result-set serialization (sources/SparqlResults):
  * sparql-results+json and TSV round-trip LOSSLESSLY for every term
  * kind and for unbound cells; CSV is the spec's lossy writer-only
  * form. */
class SparqlResultsSpec extends GraftSpec {

  /** A solution frame with every kind + an unbound column. */
  private def everyKindFrame: DataFrame = {
    val d = db(
      (k("s1"), k("p"), s("plain \"q\" \\ line\nbreak\ttab")),
      (k("s2"), k("p"), TLangString("hé", "fr-CA")),
      (k("s3"), k("p"), l(-42)),
      (k("s4"), k("p"), l(9007199254740993L)),
      (k("s5"), k("p"), TDouble(2.5)),
      (k("s6"), k("p"), TBool(false)),
      (k("s7"), k("p"), TDate("1999-12-31T23:59:59")),
      (k("s8"), k("p"), TTyped("x", "http://dt/")),
      (k("s9"), k("p"), TNil),
      (k("s10"), k("p"), TUri("http://abs/iri")),
      (k("s11"), k("p"), TUri("relative/iri")),
      (k("s12"), k("p"), Term.opaque("tag", Array[Byte](1, 2))),
      (k("s1"), k("q"), s("extra"))) // s1 binds ?extra; others unbound
    Projections.selectDf(d, Seq(
      pat(?("x"), T(k("p")), ?("v")),
      Optional(Seq(pat(?("x"), T(k("q")), ?("extra"))))),
      Seq(?("x"), ?("v"), ?("extra")))
  }

  private def asBag(df: DataFrame): Map[Seq[Term], Int] =
    bag1(df.collect().toSeq.map(r => r.toSeq.indices.map(i =>
      if (r.isNullAt(i)) null else Term.fromRow(r.getStruct(i)))))

  test("sparql-results+json: save → load round-trips every kind, " +
      "unbound = absent key; column order preserved; multi-part dirs " +
      "read back as one set") {
    val sol = everyKindFrame.repartition(3) // several part documents
    val tmp = java.nio.file.Files.createTempDirectory("graft_srj").toString
    SparqlResults.saveJson(sol, tmp)
    val back = SparqlResults.loadJson(spark, tmp)
    assert(back.columns.toSeq == Seq("x", "v", "extra"))
    assert(asBag(back) == asBag(sol))
    // the driver-side single-document form parses to the same set
    val (vars, rows) = SparqlResults.parseJsonDoc(
      SparqlResults.toJsonDoc(sol))
    assert(vars == Seq("x", "v", "extra"))
    assert(bag1(rows) == asBag(sol))
    // spot-check the wire format: unbound keys absent, lang rides
    val doc = SparqlResults.toJsonDoc(sol)
    assert(doc.contains(""""head":{"vars":["x","v","extra"]}"""))
    assert(doc.contains(""""xml:lang":"fr-CA""""))
    assert(doc.contains(
      """"datatype":"http://www.w3.org/2001/XMLSchema#integer""""))
  }

  test("sparql-results+json reader: loud on blank nodes, lang+datatype " +
      "co-occurrence, malformed docs") {
    def err(doc: String): String =
      intercept[Exception] {
        SparqlResults.parseJsonDoc(doc)
      }.getMessage
    val head = """{"head":{"vars":["x"]},"results":{"bindings":["""
    assert(err(head + """{"x":{"type":"bnode","value":"b0"}}]}}""")
      .contains("blank-node"))
    assert(err(head + """{"x":{"type":"literal","value":"v",""" +
      """"xml:lang":"en","datatype":"http://dt"}}]}}""")
      .contains("BOTH"))
    assert(err("""{"results":{}}""").contains("no head"))
    assert(err("not json").contains("malformed"))
  }

  test("sparql-results+xml: save → load round-trips every kind; " +
      "escaping; unbound = absent binding; loud error forms") {
    val sol = everyKindFrame.repartition(3)
    val tmp = java.nio.file.Files.createTempDirectory("graft_srx").toString
    SparqlResults.saveXml(sol, tmp)
    val back = SparqlResults.loadXml(spark, tmp)
    assert(back.columns.toSeq == Seq("x", "v", "extra"))
    assert(asBag(back) == asBag(sol))
    val doc = SparqlResults.toXmlDoc(sol)
    assert(doc.contains(
      """<sparql xmlns="http://www.w3.org/2005/sparql-results#">"""))
    assert(doc.contains("""xml:lang="fr-CA""""))
    val (vars, rows) = SparqlResults.parseXmlDoc(doc)
    assert(vars == Seq("x", "v", "extra") && bag1(rows) == asBag(sol))
    def err(d: String): String = intercept[Exception] {
      SparqlResults.parseXmlDoc(d)
    }.getMessage
    val pre = """<?xml version="1.0"?>""" +
      """<sparql xmlns="http://www.w3.org/2005/sparql-results#">""" +
      """<head><variable name="x"/></head><results>"""
    assert(err(pre + """<result><binding name="x"><bnode>b0</bnode>""" +
      "</binding></result></results></sparql>").contains("blank-node"))
    assert(err("<notxml").contains("malformed"))
    assert(err("""<?xml version="1.0"?><other/>""").contains("sparql"))
  }

  test("TSV: save → load round-trips every kind; per-part headers; " +
      "unbound = empty cell; malformed tokens are loud") {
    val sol = everyKindFrame.repartition(3)
    val tmp = java.nio.file.Files.createTempDirectory("graft_tsv").toString
    SparqlResults.saveTsv(sol, tmp)
    val back = SparqlResults.loadTsv(spark, tmp)
    assert(back.columns.toSeq == Seq("x", "v", "extra"))
    assert(asBag(back) == asBag(sol))
    // wire shape: ?-prefixed header
    val lines = spark.read.text(tmp).collect().map(_.getString(0))
    assert(lines.count(_ == "?x\t?v\t?extra") == 3) // one per part
    assert(intercept[Exception] {
      SparqlResults.tsvTerm("<unclosed")
    }.getMessage.contains("malformed"))
    assert(intercept[Exception] {
      SparqlResults.tsvTerm("_:b0")
    }.getMessage.contains("blank-node"))
  }

  test("ASK result documents: JSON and XML boolean forms round-trip; " +
      "SELECT documents are loud in the ASK readers and vice versa") {
    for (b <- Seq(true, false)) {
      assert(SparqlResults.parseAskJsonDoc(SparqlResults.askJsonDoc(b)) == b)
      assert(SparqlResults.parseAskXmlDoc(SparqlResults.askXmlDoc(b)) == b)
    }
    assert(SparqlResults.askJsonDoc(true) ==
      """{"head":{},"boolean":true}""")
    assert(intercept[Exception] {
      SparqlResults.parseAskJsonDoc(
        """{"head":{"vars":["x"]},"results":{"bindings":[]}}""")
    }.getMessage.contains("no boolean"))
    assert(intercept[Exception] {
      SparqlResults.parseAskXmlDoc(SparqlResults.toXmlDoc(
        everyKindFrame.limit(1)))
    }.getMessage.contains("no boolean"))
    assert(intercept[Exception] {
      SparqlResults.parseJsonDoc(SparqlResults.askJsonDoc(true))
    }.getMessage.contains("no head.vars"))
  }

  test("CSV: header + lossy lexical cells per the spec (IRIs bare, " +
      "literals raw, unbound empty)") {
    val d = db(
      (k("c1"), k("p"), s("with, comma")),
      (k("c2"), k("p"), l(7)),
      (k("c3"), k("p"), TUri("http://abs/x")))
    val sol = Projections.selectDf(d, Seq(
      pat(?("x"), T(k("p")), ?("v")),
      Optional(Seq(pat(?("x"), T(k("nope")), ?("u"))))),
      Seq(?("x"), ?("v"), ?("u")))
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString
    SparqlResults.saveCsv(sol.coalesce(1), tmp)
    val got = spark.read.option("header", "true").csv(tmp)
    assert(got.columns.toSeq == Seq("x", "v", "u"))
    val rows = got.collect().map(r => (r.getString(0), r.getString(1),
      Option(r.getString(2)))).toSet
    assert(rows == Set(
      ("urn:graft:kw/c1", "with, comma", None),
      ("urn:graft:kw/c2", "7", None),
      ("urn:graft:kw/c3", "http://abs/x", None)))
  }
}
