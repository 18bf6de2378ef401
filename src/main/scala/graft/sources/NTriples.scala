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
  * `"5"^^xsd:long` → TLong(5)); blank nodes are rejected by default
  * (the Term model has no bnodes, and none are ever written) — pass
  * `bnodes = "skolem"` to load them as per-file skolem IRIs
  * ([[BnodeBase]]), which is what makes most real public dumps
  * loadable; the writer optionally restores them
  * ([[termTokenRestore]]).
  */
object NTriples {

  private val Xsd = "http://www.w3.org/2001/XMLSchema#"
  private val KwBase = "urn:graft:kw/"
  private val RelBase = "urn:graft:rel/"
  private val NilIri = "urn:graft:nil"
  private val OpaqueBase = "urn:graft:opaque/"

  /** Reserved base for skolemized blank nodes:
    * `urn:graft:bnode/<doc-id>/<label>`. The doc-id is a per-FILE
    * hash (xxhash64 of the file URI), because bnode labels are
    * document-scoped in every RDF syntax — the same `_:b0` in two
    * files MUST NOT unify, while within one file it must. The
    * skolem IRI is an ordinary [[Term.TUri]] (RDF 1.1 §3.5
    * skolemization), so joins/GDPR/entailment treat it like any
    * other node; [[termTokenRestore]] optionally writes it back as
    * `_:<doc-id>.<label>` (a legal BLANK_NODE_LABEL — the re-export
    * stays bnode-valued, modulo the documented label mapping). */
  private[graft] val BnodeBase = "urn:graft:bnode/"

  // practical BLANK_NODE_LABEL subset (word chars, mid dots/dashes)
  private val BnodeTok = """_:[A-Za-z0-9_][A-Za-z0-9_.-]*"""

  /** Per-file skolem document id — stable for a given file path. */
  private def docIdCol: Column = lower(hex(xxhash64(input_file_name())))

  private def bnodeTerm(tok: Column, docId: Column): Column = {
    val nullS = lit(null).cast(StringType)
    Term.mk(lit(Term.KUri),
      concat(lit(BnodeBase), docId, lit("/"),
        tok.substr(lit(3), length(tok))),
      lit(null).cast(DoubleType), nullS, nullS)
  }

  private[sources] def requireBnodeMode(bnodes: String): Boolean =
    bnodes match {
      case "reject" => false
      case "skolem" => true
      case other => throw new IllegalArgumentException(
        s"bnodes mode must be 'reject' or 'skolem', got '$other'")
    }

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

  /** [[termToken]] that writes skolemized blank nodes BACK as blank
    * nodes: a `urn:graft:bnode/<doc-id>/<label>` IRI serializes as
    * `_:<doc-id>.<label>` (the '/' → '.' fold keeps the label
    * grammar-legal; doc-id prefix keeps labels from different source
    * files distinct in one merged export). Every other term is
    * [[termToken]] unchanged. */
  def termTokenRestore(c: Column): Column =
    when(c.getField("kind") === Term.KUri &&
        c.getField("lex").startsWith(BnodeBase),
      concat(lit("_:"), translate(
        c.getField("lex").substr(lit(BnodeBase.length + 1),
          length(c.getField("lex"))), "/", ".")))
      .otherwise(termToken(c))

  /** Serialize a triple DB to N-Triples text files. */
  def save(db: TripleDb, path: String): Unit =
    db.df.select(concat_ws(" ", termToken(col("s")), termToken(col("p")),
        termToken(col("o")), lit(".")).as("value"))
      .write.mode("overwrite").text(path)

  /** As [[save]]; `restoreBnodes = true` writes skolem IRIs back as
    * blank-node labels (see [[termTokenRestore]]). */
  def save(db: TripleDb, path: String, restoreBnodes: Boolean): Unit =
    if (!restoreBnodes) save(db, path)
    else db.df.select(concat_ws(" ",
        termTokenRestore(col("s")), termToken(col("p")),
        termTokenRestore(col("o")), lit(".")).as("value"))
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
  // same productions with BLANK_NODE_LABEL alternatives at subject and
  // object (capture-group count unchanged — alternation stays inside
  // the group), used only under bnodes = "skolem"
  private val SkolemLineRe =
    """^\s*(<[^>]*>|""" + BnodeTok + """)\s+(<[^>]*>)\s+(<[^>]*>|""" +
      BnodeTok +
      """|"(?:[^"\\]|\\.)*"(?:@[A-Za-z][A-Za-z0-9-]*|\^\^<[^>]*>)?)\s*\.\s*$"""
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
  def parse(lines0: DataFrame): DataFrame = parse(lines0, "reject")

  /** As [[parse]], with a blank-node mode: `"reject"` (default —
    * strict grammar, bnode lines raise) or `"skolem"` — `_:label`
    * becomes the IRI `urn:graft:bnode/<doc-id>/label` ([[BnodeBase]];
    * per-file doc-id, so labels never unify across files but always
    * within one), which makes most real public dumps loadable without
    * touching term identity. */
  def parse(lines0: DataFrame, bnodes: String): DataFrame = {
    val skolem = requireBnodeMode(bnodes)
    val re = if (skolem) SkolemLineRe else LineRe
    val lines = lines0
      .where(!(col("value").rlike("^\\s*(#.*)?$")))
    val m = lines.select(
      regexp_extract(col("value"), re, 1).as("st"),
      regexp_extract(col("value"), re, 2).as("pt"),
      regexp_extract(col("value"), re, 3).as("ot"),
      docIdCol.as("__doc"),
      col("value"))
    val checked = m.select(
      when(col("st") === "", raise_error(concat(
          lit("malformed N-Triples line: "), col("value"))))
        .otherwise(col("st")).as("st"),
      col("pt"), col("ot"), col("__doc"))
    def iriBody(c: Column): Column = c.substr(lit(2), length(c) - 2)
    def node(c: Column): Column =
      if (skolem) when(c.startsWith("_:"), bnodeTerm(c, col("__doc")))
        .otherwise(iriToTerm(iriBody(c)))
      else iriToTerm(iriBody(c))
    val obj = {
      val ot = col("ot")
      val lex = unescLit(regexp_extract(ot, ObjLitRe, 1))
      val lang = regexp_extract(ot, ObjLitRe, 2)
      val dt = regexp_extract(ot, ObjLitRe, 3)
      when(ot.startsWith("<") || ot.startsWith("_:"), node(ot))
        .otherwise(literalToTerm(lex, lang, dt))
    }
    checked.select(
      node(col("st")).as("s"),
      iriToTerm(iriBody(col("pt"))).as("p"),
      obj.as("o"))
  }

  /** Load an N-Triples export back into a [[TripleDb]]. */
  def load(spark: SparkSession, path: String): TripleDb =
    TripleDb(parse(spark.read.text(path)))

  /** [[load]] with a blank-node mode (see [[parse]]). */
  def load(spark: SparkSession, path: String, bnodes: String): TripleDb =
    TripleDb(parse(spark.read.text(path), bnodes))

  /** Streaming N-Triples ingest: tail a directory of .nt files as a
    * stream of parsed `(s, p, o)` term-struct rows — drop new export
    * files in, triples come out. Compose with the streaming tier
    * (windows, near-dup gate, [[graft.ops.Rdfs.materializeDelta]]'s
    * per-batch entailment) downstream.
    */
  def readStream(spark: SparkSession, path: String): DataFrame =
    parse(spark.readStream.text(path))

  /** [[readStream]] with a blank-node mode (see [[parse]]) — the
    * skolem doc-id rides `input_file_name()`, which the file stream
    * source populates per ingested file. */
  def readStream(spark: SparkSession, path: String, bnodes: String): DataFrame =
    parse(spark.readStream.text(path), bnodes)

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
  // bnode alternatives at subject/object/graph-label, skolem mode only
  private val SkolemQuadLineRe =
    """^\s*(<[^>]*>|""" + BnodeTok + """)\s+(<[^>]*>)\s+(<[^>]*>|""" +
      BnodeTok +
      """|"(?:[^"\\]|\\.)*"(?:@[A-Za-z][A-Za-z0-9-]*|\^\^<[^>]*>)?)(?:\s+(<[^>]*>|""" +
      BnodeTok + """))?\s*\.\s*$"""

  /** Parse raw N-Quads lines (a `value` string column) into
    * `(s, p, o, g)` term-struct rows. Same grammar discipline as
    * [[parse]]: comments/blanks skip, anything else malformed raises;
    * stateless projections, so it runs unchanged on a streaming frame.
    */
  def parseQuads(lines0: DataFrame): DataFrame = parseQuads(lines0, "reject")

  /** As [[parseQuads]], with a blank-node mode (see [[parse]]) —
    * under `"skolem"` bnodes are legal at subject, object, AND graph
    * label (N-Quads 1.1 allows blank-node graph labels). */
  def parseQuads(lines0: DataFrame, bnodes: String): DataFrame = {
    val skolem = requireBnodeMode(bnodes)
    val re = if (skolem) SkolemQuadLineRe else QuadLineRe
    val lines = lines0
      .where(!(col("value").rlike("^\\s*(#.*)?$")))
    val m = lines.select(
      regexp_extract(col("value"), re, 1).as("st"),
      regexp_extract(col("value"), re, 2).as("pt"),
      regexp_extract(col("value"), re, 3).as("ot"),
      regexp_extract(col("value"), re, 4).as("gt"),
      docIdCol.as("__doc"),
      col("value"))
    val checked = m.select(
      when(col("st") === "", raise_error(concat(
          lit("malformed N-Quads line: "), col("value"))))
        .otherwise(col("st")).as("st"),
      col("pt"), col("ot"), col("gt"), col("__doc"))
    def iriBody(c: Column): Column = c.substr(lit(2), length(c) - 2)
    def node(c: Column): Column =
      if (skolem) when(c.startsWith("_:"), bnodeTerm(c, col("__doc")))
        .otherwise(iriToTerm(iriBody(c)))
      else iriToTerm(iriBody(c))
    val obj = {
      val ot = col("ot")
      val lex = unescLit(regexp_extract(ot, ObjLitRe, 1))
      val lang = regexp_extract(ot, ObjLitRe, 2)
      val dt = regexp_extract(ot, ObjLitRe, 3)
      when(ot.startsWith("<") || ot.startsWith("_:"), node(ot))
        .otherwise(literalToTerm(lex, lang, dt))
    }
    checked.select(
      node(col("st")).as("s"),
      iriToTerm(iriBody(col("pt"))).as("p"),
      obj.as("o"),
      when(col("gt") === "", Term.lit(QuadDb.DefaultGraph))
        .otherwise(node(col("gt"))).as("g"))
  }

  /** Load an N-Quads export into a [[QuadDb]]. */
  def loadQuads(spark: SparkSession, path: String): QuadDb =
    QuadDb(parseQuads(spark.read.text(path)))

  /** [[loadQuads]] with a blank-node mode (see [[parse]]). */
  def loadQuads(spark: SparkSession, path: String, bnodes: String): QuadDb =
    QuadDb(parseQuads(spark.read.text(path), bnodes))

  /** Streaming N-Quads ingest (≙ [[readStream]], plus the graph
    * column). */
  def readStreamQuads(spark: SparkSession, path: String): DataFrame =
    parseQuads(spark.readStream.text(path))
}
