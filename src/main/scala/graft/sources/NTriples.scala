package graft.sources

import graft.core.{QuadDb, Term, TripleDb}
import graft.functions.NtExpressions.NtStringCodec
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** N-Triples interchange for [[TripleDb]] — the RDF ecosystem's
  * line-based exchange format (W3C N-Triples 1.1). The reference lives
  * inside the grafter RDF stack where stores arrive as serialized RDF;
  * a drop-in engine needs to read and write the interchange form, not
  * just its own parquet layout (complements TripleDb.save /
  * TripleDb.saveJsonl).
  *
  * Serialization is one narrow projection per direction — every rule is
  * a codegen'd `when` chain over the term struct plus the
  * [[NtStringCodec]] escape loops; there is no shuffle and no driver
  * state, so both directions scale as plain text scans. Reads of
  * malformed lines fail loudly (`raise_error`), not silently as nil.
  *
  * Term-kind mapping (graft extends RDF's term set, so non-RDF kinds
  * ride on reserved `urn:graft:` IRIs; standard RDF stays standard):
  *  - TUri with a scheme        → `<uri>`; scheme-less (this engine's
  *    row URIs like `customer/7`) → `<urn:graft:rel/uri>`
  *  - TKeyword(n)               → `<urn:graft:kw/n>`
  *  - TNil                      → `<urn:graft:nil>`
  *  - TString / TLangString     → `"lex"` / `"lex"@lang`
  *  - TLong                     → `"lex"^^xsd:long` (lexical is the
  *    exact decimal — longs past 2^53 survive)
  *  - TDouble                   → `"java-repr"^^xsd:double` (Double
  *    toString/parse round-trips bit-exactly)
  *  - TBool                     → `"true|false"^^xsd:boolean`
  *  - TDate(iso)                → `"iso"^^xsd:dateTime`
  *  - TOpaque(tag, b64)         → `"b64"^^<urn:graft:opaque/tag>`
  *  - TTyped(lex, dt)           → `"lex"^^<dt>`
  *
  * Documented normalizations: a TTyped whose datatype is one of the
  * xsd types above parses back as the native kind (e.g.
  * `"5"^^xsd:long` → TLong(5)); blank nodes are rejected (the Term
  * model has no bnodes, and none are ever written).
  */
object NTriples {

  private val Xsd = "http://www.w3.org/2001/XMLSchema#"
  private val KwBase = "urn:graft:kw/"
  private val RelBase = "urn:graft:rel/"
  private val NilIri = "urn:graft:nil"
  private val OpaqueBase = "urn:graft:opaque/"

  private def escLit(c: Column): Column =
    GraftSqlBridge.column(NtStringCodec(GraftSqlBridge.expression(c),
      iri = false, decode = false))
  private def unescLit(c: Column): Column =
    GraftSqlBridge.column(NtStringCodec(GraftSqlBridge.expression(c),
      iri = false, decode = true))
  private def escIri(c: Column): Column =
    GraftSqlBridge.column(NtStringCodec(GraftSqlBridge.expression(c),
      iri = true, decode = false))
  private def unescIri(c: Column): Column =
    GraftSqlBridge.column(NtStringCodec(GraftSqlBridge.expression(c),
      iri = true, decode = true))

  private def iriTok(body: Column): Column =
    concat(lit("<"), body, lit(">"))
  private def litTok(lex: Column): Column =
    concat(lit("\""), escLit(lex), lit("\""))
  private def typedTok(lex: Column, dt: Column): Column =
    concat(litTok(lex), lit("^^"), iriTok(dt))

  /** One term struct → its N-Triples token. */
  def termToken(c: Column): Column = {
    val kind = c.getField("kind")
    val lex = c.getField("lex")
    val num = c.getField("num")
    val hasScheme = lex.rlike("^[A-Za-z][A-Za-z0-9+.-]*:")
    when(kind === Term.KNil, lit(s"<$NilIri>"))
      .when(kind === Term.KKeyword, iriTok(concat(lit(KwBase), escIri(lex))))
      .when(kind === Term.KUri,
        when(hasScheme, iriTok(escIri(lex)))
          .otherwise(iriTok(concat(lit(RelBase), escIri(lex)))))
      .when(kind === Term.KString, litTok(lex))
      .when(kind === Term.KLong, typedTok(lex, lit(s"${Xsd}long")))
      .when(kind === Term.KDouble,
        typedTok(num.cast(StringType), lit(s"${Xsd}double")))
      .when(kind === Term.KBool,
        typedTok(when(num =!= 0.0, "true").otherwise("false"),
          lit(s"${Xsd}boolean")))
      .when(kind === Term.KLangString,
        concat(litTok(lex), lit("@"), c.getField("lang")))
      .when(kind === Term.KTyped, typedTok(lex, escIri(c.getField("datatype"))))
      .when(kind === Term.KDate, typedTok(lex, lit(s"${Xsd}dateTime")))
      .when(kind === Term.KOpaque,
        typedTok(lex, concat(lit(OpaqueBase), escIri(c.getField("datatype")))))
      .otherwise(raise_error(concat(
        lit("cannot serialize term kind "), kind.cast(StringType))))
  }

  /** Serialize a triple DB to N-Triples text files. */
  def save(db: TripleDb, path: String): Unit =
    db.df.select(concat_ws(" ", termToken(col("s")), termToken(col("p")),
        termToken(col("o")), lit(".")).as("value"))
      .write.mode("overwrite").text(path)

  /** An IRI body (the text between `<` and `>`) back to a term struct. */
  private def iriToTerm(body: Column): Column = {
    val b = unescIri(body)
    val nullS = lit(null).cast(StringType)
    val nullD = lit(null).cast(DoubleType)
    when(b === NilIri, Term.lit(Term.TNil))
      .when(b.startsWith(KwBase),
        Term.mk(lit(Term.KKeyword), b.substr(lit(KwBase.length + 1),
          length(b)), nullD, nullS, nullS))
      .when(b.startsWith(RelBase),
        Term.mk(lit(Term.KUri), b.substr(lit(RelBase.length + 1),
          length(b)), nullD, nullS, nullS))
      .otherwise(Term.mk(lit(Term.KUri), b, nullD, nullS, nullS))
  }

  /** A literal (lex already unescaped; lang/dt possibly empty) → term. */
  private def literalToTerm(lex: Column, lang: Column, dt0: Column): Column = {
    val dt = unescIri(dt0)
    val nullS = lit(null).cast(StringType)
    val nullD = lit(null).cast(DoubleType)
    when(lang =!= "", Term.mk(lit(Term.KLangString), lex, nullD, lang, nullS))
      .when(dt === s"${Xsd}long" || dt === s"${Xsd}integer" ||
          dt === s"${Xsd}int",
        Term.mk(lit(Term.KLong), lex, lex.cast(DoubleType), nullS, nullS))
      .when(dt === s"${Xsd}double" || dt === s"${Xsd}decimal",
        Term.mk(lit(Term.KDouble), nullS, lex.cast(DoubleType), nullS, nullS))
      .when(dt === s"${Xsd}boolean",
        Term.mk(lit(Term.KBool), nullS,
          when(lex === "true", 1.0).otherwise(0.0), nullS, nullS))
      .when(dt === s"${Xsd}dateTime",
        Term.mk(lit(Term.KDate), lex, nullD, nullS, nullS))
      .when(dt.startsWith(OpaqueBase),
        Term.mk(lit(Term.KOpaque), lex, nullD, nullS,
          dt.substr(lit(OpaqueBase.length + 1), length(dt))))
      .when(dt =!= "", Term.mk(lit(Term.KTyped), lex, nullD, nullS, dt))
      .otherwise(Term.mk(lit(Term.KString), lex, nullD, nullS, nullS))
  }

  // N-Triples 1.1 line grammar, subject/predicate/object + final dot.
  // Object literal lexical admits any ECHAR/UCHAR sequence; the
  // separate `lex` capture keeps escaped quotes inside the body.
  private val LineRe =
    """^\s*(<[^>]*>)\s+(<[^>]*>)\s+(<[^>]*>|"(?:[^"\\]|\\.)*"(?:@[A-Za-z][A-Za-z0-9-]*|\^\^<[^>]*>)?)\s*\.\s*$"""
  private val ObjLitRe =
    """^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z][A-Za-z0-9-]*)|\^\^<([^>]*)>)?$"""

  /** Parse a DataFrame of raw N-Triples lines (a `value` string
    * column) into `(s, p, o)` term-struct rows. Comment and blank
    * lines are skipped; anything else that does not match the grammar
    * (including blank nodes, which the Term model cannot represent)
    * raises. Pure stateless projections, so it works unchanged on a
    * STREAMING frame (`spark.readStream.text(dir)` — see
    * [[readStream]]) for live interchange ingest.
    */
  def parse(lines0: DataFrame): DataFrame = {
    val lines = lines0
      .where(!(col("value").rlike("^\\s*(#.*)?$")))
    val m = lines.select(
      regexp_extract(col("value"), LineRe, 1).as("st"),
      regexp_extract(col("value"), LineRe, 2).as("pt"),
      regexp_extract(col("value"), LineRe, 3).as("ot"),
      col("value"))
    val checked = m.select(
      when(col("st") === "", raise_error(concat(
          lit("malformed N-Triples line: "), col("value"))))
        .otherwise(col("st")).as("st"),
      col("pt"), col("ot"))
    def iriBody(c: Column): Column = c.substr(lit(2), length(c) - 2)
    val obj = {
      val ot = col("ot")
      val lex = unescLit(regexp_extract(ot, ObjLitRe, 1))
      val lang = regexp_extract(ot, ObjLitRe, 2)
      val dt = regexp_extract(ot, ObjLitRe, 3)
      when(ot.startsWith("<"), iriToTerm(iriBody(ot)))
        .otherwise(literalToTerm(lex, lang, dt))
    }
    checked.select(
      iriToTerm(iriBody(col("st"))).as("s"),
      iriToTerm(iriBody(col("pt"))).as("p"),
      obj.as("o"))
  }

  /** Load an N-Triples export back into a [[TripleDb]]. */
  def load(spark: SparkSession, path: String): TripleDb =
    TripleDb(parse(spark.read.text(path)))

  /** Streaming N-Triples ingest: tail a directory of .nt files as a
    * stream of parsed `(s, p, o)` term-struct rows — drop new export
    * files in, triples come out. Compose with the streaming tier
    * (windows, near-dup gate, [[graft.ops.Rdfs.materializeDelta]]'s
    * per-batch entailment) downstream.
    */
  def readStream(spark: SparkSession, path: String): DataFrame =
    parse(spark.readStream.text(path))

  // ---------------------------------------------------------------
  // N-Quads 1.1 — the named-graph interchange form (W3C N-Quads 1.1:
  // an N-Triples line plus an optional graph-label IRI before the
  // dot). Same narrow-projection scale shape both ways; a line with
  // no graph label is the DEFAULT graph, which maps to QuadDb's
  // nil-graph ([[QuadDb.DefaultGraph]]) — so N-Triples files load as
  // all-default-graph quad stores unchanged.
  // ---------------------------------------------------------------

  /** Serialize a quad DB to N-Quads text files; default-graph quads
    * emit plain N-Triples lines (no graph label), per the spec. */
  def saveQuads(db: QuadDb, path: String): Unit =
    db.df.select(concat_ws(" ", termToken(col("s")), termToken(col("p")),
        termToken(col("o")),
        when(col("g") === Term.lit(QuadDb.DefaultGraph), lit("."))
          .otherwise(concat_ws(" ", termToken(col("g")), lit(".")))).as("value"))
      .write.mode("overwrite").text(path)

  // N-Quads line: the N-Triples production plus an optional IRIREF
  // graph label. (Blank-node graph labels, like all blank nodes,
  // are rejected — the Term model has none.)
  private val QuadLineRe =
    """^\s*(<[^>]*>)\s+(<[^>]*>)\s+(<[^>]*>|"(?:[^"\\]|\\.)*"(?:@[A-Za-z][A-Za-z0-9-]*|\^\^<[^>]*>)?)(?:\s+(<[^>]*>))?\s*\.\s*$"""

  /** Parse raw N-Quads lines (a `value` string column) into
    * `(s, p, o, g)` term-struct rows. Same grammar discipline as
    * [[parse]]: comments/blanks skip, anything else malformed raises;
    * stateless projections, so it runs unchanged on a streaming frame.
    */
  def parseQuads(lines0: DataFrame): DataFrame = {
    val lines = lines0
      .where(!(col("value").rlike("^\\s*(#.*)?$")))
    val m = lines.select(
      regexp_extract(col("value"), QuadLineRe, 1).as("st"),
      regexp_extract(col("value"), QuadLineRe, 2).as("pt"),
      regexp_extract(col("value"), QuadLineRe, 3).as("ot"),
      regexp_extract(col("value"), QuadLineRe, 4).as("gt"),
      col("value"))
    val checked = m.select(
      when(col("st") === "", raise_error(concat(
          lit("malformed N-Quads line: "), col("value"))))
        .otherwise(col("st")).as("st"),
      col("pt"), col("ot"), col("gt"))
    def iriBody(c: Column): Column = c.substr(lit(2), length(c) - 2)
    val obj = {
      val ot = col("ot")
      val lex = unescLit(regexp_extract(ot, ObjLitRe, 1))
      val lang = regexp_extract(ot, ObjLitRe, 2)
      val dt = regexp_extract(ot, ObjLitRe, 3)
      when(ot.startsWith("<"), iriToTerm(iriBody(ot)))
        .otherwise(literalToTerm(lex, lang, dt))
    }
    checked.select(
      iriToTerm(iriBody(col("st"))).as("s"),
      iriToTerm(iriBody(col("pt"))).as("p"),
      obj.as("o"),
      when(col("gt") === "", Term.lit(QuadDb.DefaultGraph))
        .otherwise(iriToTerm(iriBody(col("gt")))).as("g"))
  }

  /** Load an N-Quads export into a [[QuadDb]]. */
  def loadQuads(spark: SparkSession, path: String): QuadDb =
    QuadDb(parseQuads(spark.read.text(path)))

  /** Streaming N-Quads ingest (≙ [[readStream]], plus the graph
    * column). */
  def readStreamQuads(spark: SparkSession, path: String): DataFrame =
    parseQuads(spark.readStream.text(path))
}
