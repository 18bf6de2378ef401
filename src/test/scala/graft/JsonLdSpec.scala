package graft

import graft.core.{QuadDb, Term, TripleDb}
import graft.core.Term._
import graft.sources.{JsonLd, NTriples}

/** JSON-LD flattened-subset reader/writer (sources/JsonLd.scala). */
class JsonLdSpec extends GraftSpec {

  private def writeLines(lines: String*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonld")
    java.nio.file.Files.write(dir.resolve("d.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  private def parseStr(lines: String*): Set[(Term, Term, Term)] =
    JsonLd.load(spark, writeLines(lines: _*)).triples.toSet

  test("jsonld: node objects — @type, arrays, value objects, numbers, " +
      "booleans, node refs, reserved-base decode, graph objects") {
    val got = parseStr(
      """{"@id":"http://ex/alice","@type":"http://ex/Person",""" +
        """"urn:graft:kw/age":42,"urn:graft:kw/score":[2.5,100.0],""" +
        """"urn:graft:kw/active":true,""" +
        """"urn:graft:kw/name":["Alice",{"@value":"Alize","@language":"fr"}],""" +
        """"urn:graft:kw/joined":{"@value":"2024-02-29T00:00:00",""" +
        """"@type":"http://www.w3.org/2001/XMLSchema#dateTime"},""" +
        """"urn:graft:kw/height":{"@value":"1.75","@type":"http://sq/meters"},""" +
        """"urn:graft:kw/knows":{"@id":"urn:graft:kw/bob"}}""",
      """{"@id":"urn:graft:rel/row/7","urn:graft:kw/label":"rel row",""" +
        """"urn:graft:kw/gone":{"@id":"urn:graft:nil"}}""")
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
      (alice, k("joined"), TDate("2024-02-29T00:00:00")),
      (alice, k("height"), TTyped("1.75", "http://sq/meters")),
      (alice, k("knows"), k("bob")),
      (TUri("row/7"), k("label"), s("rel row")),
      (TUri("row/7"), k("gone"), TNil)))
  }

  test("jsonld: graph objects scope to named graphs in the quad view; " +
      "the triple view drops scoping; a graph may span lines") {
    val dir = writeLines(
      """{"@id":"http://g/1","@graph":[{"@id":"urn:graft:kw/a","urn:graft:kw/p":1}]}""",
      """{"@id":"http://g/1","@graph":[{"@id":"urn:graft:kw/b","urn:graft:kw/p":2}]}""",
      """{"@id":"urn:graft:kw/c","urn:graft:kw/p":3}""")
    val quads = JsonLd.loadQuads(spark, dir).quads.toSet
    assert(quads == Set(
      (k("a"), k("p"), l(1), TUri("http://g/1")),
      (k("b"), k("p"), l(2), TUri("http://g/1")),
      (k("c"), k("p"), l(3), QuadDb.DefaultGraph)))
    assert(JsonLd.load(spark, dir).triples.toSet == Set(
      (k("a"), k("p"), l(1)), (k("b"), k("p"), l(2)),
      (k("c"), k("p"), l(3))))
  }

  test("jsonld: outside-subset forms fail loudly — @context, @list, " +
      "nested node objects, missing @id, relative keys, null values, " +
      "int64 overflow, malformed JSON") {
    // parse a one-row in-memory frame instead of writing + loading a
    // temp file per case: same parser expressions, same loud errors,
    // a fraction of the per-case cost (round 16 — the loud-forms test
    // was the single slowest in the suite at 44 s)
    def err(line: String): String = {
      import spark.implicits._
      intercept[Exception] {
        JsonLd.parse(Seq(line).toDF("value")).collect()
      } match {
        case e => (Option(e.getMessage) ++
          Option(e.getCause).map(_.getMessage)).mkString(" | ")
      }
    }
    // remote-context URLs stay outside the subset (the prefix-MAP
    // form is legal since round 14 — see the @context test)
    assert(err("""{"@context":"http://ctx/","@id":"http://s"}""")
      .contains("@context"))
    assert(err("""{"@id":"http://s","http://p":{"@list":[1]}}""")
      .contains("@list"))
    assert(err(
      """{"@id":"http://s","http://p":{"@id":"http://o","http://q":1}}""")
      .contains("not flattened"))
    assert(err("""{"http://p":1}""").contains("no @id"))
    assert(err("""{"@id":"http://s","name":1}""")
      .contains("not an absolute IRI"))
    assert(err("""{"@id":"http://s","http://p":null}""").contains("null"))
    assert(err("""{"@id":"http://s","http://p":99999999999999999999}""")
      .contains("int64"))
    assert(err("""not json""").contains("malformed JSON"))
    // non-string keyword payloads are loud, never null-IRI NPEs
    assert(err("""{"@id":7,"http://p":1}""").contains("@id must be"))
    assert(err("""{"@id":"http://s","@type":7}""").contains("@type must be"))
    assert(err("""[1,2]""").contains("must be a JSON object"))
    assert(err("""{"@id":"_:b0","http://p":1}""").contains("blank node"))
    // invalid @value objects are loud, never silently-dropped members
    assert(err("""{"@id":"http://s","http://p":""" +
      """{"@value":"x","@language":"en","@type":"http://dt"}}""")
      .contains("BOTH @language and @type"))
    assert(err("""{"@id":"http://s","http://p":""" +
      """{"@value":"x","@index":"i"}}""").contains("@index"))
    assert(err("""{"@id":"http://s","http://p":""" +
      """{"@value":"x","http://q":1}}""").contains("beside @value"))
  }

  test("jsonld: @context prefix-map subset — compact IRIs expand in " +
      "keys and @type; prefixed store ≡ the full-IRI store (the " +
      "cross-format pin); other @context forms are loud") {
    val full = parseStr(
      """{"@id":"http://ex/alice","@type":"http://schema.org/Person",""" +
        """"urn:graft:kw/age":42,"http://schema.org/name":"Alice"}""")
    val prefixed = parseStr(
      """{"@context":{"gk":"urn:graft:kw/","sdo":"http://schema.org/"},""" +
        """"@id":"http://ex/alice","@type":"sdo:Person",""" +
        """"gk:age":42,"sdo:name":"Alice"}""")
    assert(prefixed == full)
    // a graph object's context scopes over its nested nodes; a nested
    // node's own context layers on top
    val g = writeLines(
      """{"@context":{"gk":"urn:graft:kw/"},"@id":"http://g/1",""" +
        """"@graph":[{"@id":"gk:ignored-not-expanded","gk:p":1},""" +
        """{"@context":{"x":"http://x/"},"@id":"urn:graft:kw/b","x:q":2}]}""")
    // NOTE @id stays un-expanded by design (keys and @type only): the
    // first nested node's @id is 'gk:ignored-not-expanded', which is
    // scheme-shaped ('gk:...') and maps to a plain absolute IRI
    val quads = JsonLd.loadQuads(spark, g).quads.toSet
    assert(quads == Set(
      (TUri("gk:ignored-not-expanded"), k("p"), l(1), TUri("http://g/1")),
      (k("b"), TUri("http://x/q"), l(2), TUri("http://g/1"))))
    // parse a one-row in-memory frame instead of writing + loading a
    // temp file per case: same parser expressions, same loud errors,
    // a fraction of the per-case cost (round 16 — the loud-forms test
    // was the single slowest in the suite at 44 s)
    def err(line: String): String = {
      import spark.implicits._
      intercept[Exception] {
        JsonLd.parse(Seq(line).toDF("value")).collect()
      } match {
        case e => (Option(e.getMessage) ++
          Option(e.getCause).map(_.getMessage)).mkString(" | ")
      }
    }
    assert(err("""{"@context":"http://schema.org/","@id":"http://s"}""")
      .contains("prefix-map OBJECT"))
    assert(err("""{"@context":{"gk":{"@id":"http://x/"}},"@id":"http://s"}""")
      .contains("IRI string"))
    assert(err("""{"@context":{"gk":"relative/base/"},"@id":"http://s"}""")
      .contains("absolute IRI"))
    assert(err("""{"@context":{"@base":"http://b/"},"@id":"http://s"}""")
      .contains("@base"))
    assert(err("""{"@context":{"@vocab":"http://v/x"},"@id":"http://s"}""")
      .contains("ending in"))
    // an UNDECLARED colon key passes through UNCHANGED — 'zz:name' is
    // scheme-shaped, so it maps to the absolute IRI zz:name exactly
    // like JSON-LD's IRI-as-key rule (never a silent prefix guess)
    assert(parseStr("""{"@context":{"gk":"http://x/"},"@id":"http://s",""" +
      """"zz:name":1}""") == Set(
      (TUri("http://s"), TUri("zz:name"), l(1))))
  }

  test("jsonld: @context term aliases and @vocab — plain schema.org-" +
      "shaped embeds (bare keys) expand; aliased store ≡ the full-IRI " +
      "store; non-gen-delim entries alias but never prefix") {
    val full = parseStr(
      """{"@id":"http://ex/alice","@type":"http://schema.org/Person",""" +
        """"http://schema.org/name":"Alice",""" +
        """"http://schema.org/knows":{"@id":"http://ex/bob"}}""")
    // string term definitions: bare keys and bare @type values alias
    val aliased = parseStr(
      """{"@context":{"name":"http://schema.org/name",""" +
        """"knows":"http://schema.org/knows",""" +
        """"Person":"http://schema.org/Person"},""" +
        """"@id":"http://ex/alice","@type":"Person",""" +
        """"name":"Alice","knows":{"@id":"http://ex/bob"}}""")
    assert(aliased == full)
    // @vocab absolutizes the REMAINING bare keys/@type values; an
    // explicit term alias wins over the vocab default
    val vocabbed = parseStr(
      """{"@context":{"@vocab":"http://schema.org/",""" +
        """"name":"http://schema.org/name"},""" +
        """"@id":"http://ex/alice","@type":"Person",""" +
        """"name":"Alice","knows":{"@id":"http://ex/bob"}}""")
    assert(vocabbed == full)
    // a non-gen-delim alias works BARE but never as a prefix: bare
    // 'p' → the full IRI; 'p:x' is scheme-shaped and passes through
    assert(parseStr("""{"@context":{"p":"http://x/y"},"@id":"http://s",""" +
      """"p":1,"p:x":2}""") == Set(
      (TUri("http://s"), TUri("http://x/y"), l(1)),
      (TUri("http://s"), TUri("p:x"), l(2))))
    // a bare key with NO alias and NO vocab still fails loudly
    val e = intercept[Exception] {
      parseStr("""{"@context":{"q":"http://x/y"},"@id":"http://s","zz":1}""")
    }
    assert((Option(e.getMessage) ++ Option(e.getCause).map(_.getMessage))
      .mkString(" | ").contains("absolute IRI"))
  }

  test("jsonld: blank nodes skolemize per FILE under bnodes=skolem " +
      "(the NTriples contract — join within a file, never across)") {
    val d1 = writeLines(
      """{"@id":"_:x","urn:graft:kw/p":{"@id":"_:y"}}""")
    val d2 = java.nio.file.Files.createTempDirectory("graft_jsonld2")
    java.nio.file.Files.write(d2.resolve("e.jsonl"),
      """{"@id":"_:x","urn:graft:kw/p":{"@id":"_:y"}}""".getBytes("UTF-8"))
    val both = spark.read.text(d1, d2.toString)
    val got = TripleDb(JsonLd.parse(both, bnodes = "skolem")).triples
    assert(got.size == 2)
    // two files → two distinct skolem subjects under the reserved base
    val subs = got.map(_._1).collect { case TUri(u) => u }.toSet
    assert(subs.size == 2 && subs.forall(_.startsWith("urn:graft:bnode/")))
  }

  test("jsonld: store → save → load round-trip is term-identical for " +
      "every kind; quad save round-trips graphs; cross-format: the " +
      "same store via N-Triples is term-identical (the Turtle pin)") {
    val db = TripleDb.fromTerms(spark, Seq(
      (k("s1"), k("p"), s("plain \"quoted\" \\ line\nbreak")),
      (k("s1"), k("p"), TLangString("hé", "fr-CA")),
      (k("s1"), k("q"), l(-42)),
      (k("s1"), k("q"), l(9007199254740993L)), // 2^53 + 1: exact int64
      (k("s2"), k("p"), TDouble(2.5)),
      (k("s2"), k("p"), TBool(false)),
      (k("s2"), k("q"), TDate("1999-12-31T23:59:59")),
      (k("s2"), k("q"), TTyped("x", "http://dt/")),
      (k("s3"), k("p"), TNil),
      (k("s3"), k("p"), TUri("http://abs/iri")),
      (k("s3"), k("q"), TUri("relative/iri")),
      (k("s3"), k("q"), Term.opaque("tag", Array[Byte](1, 2, 3)))))
    val tmp = java.nio.file.Files.createTempDirectory("graft_jl_rt").toString
    JsonLd.save(db, tmp)
    assert(JsonLd.load(spark, tmp).triples.toSet == db.triples.toSet)
    // multi-valued predicates emit ONE array key (never duplicate
    // keys), subjects one line each
    val lines = spark.read.text(tmp).collect().map(_.getString(0))
    assert(lines.length == 3)
    assert(lines.forall(ln => ln.startsWith("""{"@id":""")))
    // N-Triples round-trip of the SAME store maps to identical terms
    val tmpNt = java.nio.file.Files.createTempDirectory("graft_jl_nt").toString
    NTriples.save(db, tmpNt)
    assert(NTriples.load(spark, tmpNt).triples.toSet ==
      JsonLd.load(spark, tmp).triples.toSet)
    // quads: named graphs + default graph round-trip
    val qdb = QuadDb(TripleDb.fromTerms(spark, Seq(
      (k("a"), k("p"), l(1)), (k("b"), k("p"), l(2)))).df
      .withColumn("g", org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("s") === Term.lit(k("a")),
        Term.lit(TUri("http://g/1"))).otherwise(Term.lit(QuadDb.DefaultGraph))))
    val tmpQ = java.nio.file.Files.createTempDirectory("graft_jl_q").toString
    JsonLd.saveQuads(qdb, tmpQ)
    assert(JsonLd.loadQuads(spark, tmpQ).quads.toSet == qdb.quads.toSet)
  }
}
