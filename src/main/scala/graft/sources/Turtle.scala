package graft.sources

import graft.core.{QuadDb, Term, TripleDb}
import graft.functions.NtExpressions
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Turtle interchange (a practical subset of W3C Turtle 1.1) — the
  * format RDF users actually have on disk, complementing the line-based
  * [[NTriples]] bulk path.
  *
  * Supported subset (read): `@prefix` / SPARQL-style `PREFIX`
  * directives, prefixed names, full IRIREFs (UCHAR escapes decoded,
  * percent sequences verbatim — same RFC 3987 identity rules as
  * [[NTriples]]), the `a` keyword, `;` predicate lists and `,` object
  * lists, short and long (triple-quoted) string literals in both quote
  * styles with ECHAR/UCHAR escapes, `@lang` tags, `^^` datatypes
  * (IRIREF or prefixed), bare numeric / boolean abbreviations, and
  * comments. Everything outside the subset FAILS LOUDLY with an offset
  * diagnostic: blank nodes and collections (the Term model has none),
  * `@base` / relative-IRI resolution, and malformed input. Parse errors
  * are never silent nils.
  *
  * Term mapping is [[NTriples]]' exactly (the `urn:graft:` reserved
  * bases decode to native kinds; xsd-typed literals normalize) —
  * pinned by the cross-format spec test.
  *
  * Scale shape: Turtle is NOT a splittable format (prefix directives
  * are document-scoped state), so parallelism is per-FILE — each file
  * parses in one task via a flat JVM scanner, the same contract every
  * production RDF loader has for Turtle. Per-file memory is one file's
  * triples. For multi-TB single-file dumps, convert to (gzipped)
  * N-Triples, which this engine streams line-parallel.
  *
  * The writer emits one self-contained Turtle document per partition
  * (each part file carries its own `@prefix` header), keeping the sink
  * fully distributed; keyword predicates compress to `gk:` prefixed
  * names where PN_LOCAL-safe, everything else falls back to full
  * IRIREFs (always grammar-legal).
  */
object Turtle {

  private val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  private val Xsd = "http://www.w3.org/2001/XMLSchema#"
  private val KwBase = "urn:graft:kw/"
  private val RelBase = "urn:graft:rel/"
  private val NilIri = "urn:graft:nil"
  private val OpaqueBase = "urn:graft:opaque/"

  // ---------------------------------------------------------------
  // Term mapping (Scala-side mirror of NTriples.iriToTerm /
  // literalToTerm — spec-pinned equivalent)
  // ---------------------------------------------------------------

  private[graft] def termOfIri(body: String): Term =
    if (body == NilIri) Term.TNil
    else if (body.startsWith(KwBase)) Term.TKeyword(body.substring(KwBase.length))
    else if (body.startsWith(RelBase)) Term.TUri(body.substring(RelBase.length))
    else Term.TUri(body)

  private[graft] def termOfLiteral(lex: String, lang: String,
                                     dt: String): Term =
    if (lang.nonEmpty) Term.TLangString(lex, lang)
    else if (dt == s"${Xsd}long" || dt == s"${Xsd}integer" || dt == s"${Xsd}int")
      Term.TLong(lex.toLong)
    else if (dt == s"${Xsd}double" || dt == s"${Xsd}decimal")
      Term.TDouble(lex.toDouble)
    else if (dt == s"${Xsd}boolean") Term.TBool(lex == "true")
    else if (dt == s"${Xsd}dateTime") Term.TDate(lex)
    else if (dt.startsWith(OpaqueBase))
      Term.TOpaque(dt.substring(OpaqueBase.length), lex)
    else if (dt.nonEmpty) Term.TTyped(lex, dt)
    else Term.TString(lex)

  // ---------------------------------------------------------------
  // Reader
  // ---------------------------------------------------------------

  /** Parse one Turtle document. Fails loudly with an offset diagnostic
    * on anything outside the documented subset. */
  private[sources] def parseDoc(doc: String): Seq[(Term, Term, Term)] =
    parseDoc(doc, None)

  /** `bnodeDoc = Some(docId)` enables skolemization: `_:label` (and
    * `[]`-free anonymous forms stay rejected) parses as the IRI
    * `urn:graft:bnode/<docId>/label` — the same mapping and per-file
    * scoping as [[NTriples.parse]]'s skolem mode. */
  private[sources] def parseDoc(doc: String,
      bnodeDoc: Option[String]): Seq[(Term, Term, Term)] =
    new Parser(doc, trig = false, bnodeDoc).parseAll()
      .map(q => (q._1, q._2, q._3))

  /** Parse one TriG document (Turtle + named-graph blocks:
    * `GRAPH <g> { … }`, label-only `<g> { … }`, bare `{ … }` for the
    * default graph, plus top-level default-graph statements). */
  private[sources] def parseDocTrig(doc: String): Seq[(Term, Term, Term, Term)] =
    parseDocTrig(doc, None)

  private[sources] def parseDocTrig(doc: String,
      bnodeDoc: Option[String]): Seq[(Term, Term, Term, Term)] =
    new Parser(doc, trig = true, bnodeDoc).parseAll()

  private final class Parser(doc: String, trig: Boolean,
                             bnodeDoc: Option[String] = None) {
    private var i = 0
    private val n = doc.length
    private val prefixes = mutable.Map.empty[String, String]
    private var curGraph: Term = QuadDb.DefaultGraph
    private val out = mutable.ArrayBuffer.empty[(Term, Term, Term, Term)]

    private def fail(msg: String): Nothing = {
      val ctx = doc.substring(i, math.min(n, i + 24)).replace("\n", "\\n")
      throw new IllegalArgumentException(
        s"Turtle parse error at offset $i ('$ctx…'): $msg")
    }

    private def skipWs(): Unit = {
      var go = true
      while (go && i < n) {
        val c = doc.charAt(i)
        if (c == '#') { while (i < n && doc.charAt(i) != '\n') i += 1 }
        else if (Character.isWhitespace(c)) i += 1
        else go = false
      }
    }

    private def expect(c: Char): Unit = {
      if (i >= n || doc.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }

    private def peek: Char = if (i < n) doc.charAt(i) else '\u0000'

    private def startsWithWord(w: String): Boolean =
      doc.regionMatches(true, i, w, 0, w.length)

    def parseAll(): Seq[(Term, Term, Term, Term)] = {
      skipWs()
      while (i < n) {
        if (peek == '@' || ((startsWithWord("PREFIX") || startsWithWord("BASE"))
            && prefixLike())) directive()
        else if (trig) blockOrStatement()
        else statement()
        skipWs()
      }
      out.toSeq
    }

    /** TriG top level: `GRAPH label { … }`, `label { … }`, a bare
      * default-graph `{ … }`, or a plain default-graph statement. The
      * label/subject ambiguity resolves by one term of lookahead: a
      * term followed by '{' is a graph label.
      */
    private def blockOrStatement(): Unit = {
      if (startsWithWord("GRAPH") && i + 5 < n &&
          Character.isWhitespace(doc.charAt(i + 5))) {
        i += 5
        skipWs()
        val g = term(subjectPos = true)
        skipWs()
        graphBlock(g)
      } else if (peek == '{') {
        graphBlock(QuadDb.DefaultGraph)
      } else {
        val start = i
        val t = term(subjectPos = true)
        skipWs()
        if (peek == '{') graphBlock(t)
        else { i = start; statement() }
      }
    }

    private def graphBlock(g: Term): Unit = {
      expect('{')
      val prev = curGraph
      curGraph = g
      skipWs()
      while (i < n && peek != '}') { statement(); skipWs() }
      expect('}')
      curGraph = prev
    }

    /** A word PREFIX/BASE only opens a directive when followed by
      * whitespace or ':' context — a prefixed name like `BASE:x` is a
      * term. Directives are only recognized at statement start. */
    private def prefixLike(): Boolean = {
      val w = if (startsWithWord("PREFIX")) 6 else 4
      i + w < n && Character.isWhitespace(doc.charAt(i + w))
    }

    private def directive(): Unit = {
      val sparqlStyle = peek != '@'
      if (!sparqlStyle) i += 1
      if (startsWithWord("prefix")) {
        i += 6
        skipWs()
        val name = pnamePrefix()
        expect(':')
        skipWs()
        val iri = iriRef()
        prefixes(name) = iri
        skipWs()
        if (!sparqlStyle) expect('.')
      } else if (startsWithWord("base")) {
        fail("@base / relative-IRI resolution is outside the supported " +
          "Turtle subset — use absolute IRIs")
      } else fail("unknown directive")
    }

    private def pnamePrefix(): String = {
      val start = i
      while (i < n && doc.charAt(i) != ':' &&
        !Character.isWhitespace(doc.charAt(i))) i += 1
      doc.substring(start, i)
    }

    private def iriRef(): String = {
      expect('<')
      val start = i
      while (i < n && doc.charAt(i) != '>') i += 1
      if (i >= n) fail("unterminated IRIREF")
      val body = doc.substring(start, i)
      i += 1
      NtExpressions.iriDecode(body)
    }

    private def statement(): Unit = {
      val subj = term(subjectPos = true)
      var more = true
      while (more) {
        skipWs()
        val pred =
          if (peek == 'a' && i + 1 < n &&
              (Character.isWhitespace(doc.charAt(i + 1)))) {
            i += 1; termOfIri(RdfType)
          } else term(subjectPos = true)
        var moreObj = true
        while (moreObj) {
          skipWs()
          val obj = term(subjectPos = false)
          out += ((subj, pred, obj, curGraph))
          skipWs()
          if (peek == ',') { i += 1 } else moreObj = false
        }
        if (peek == ';') {
          i += 1; skipWs()
          // trailing ';' before '.' is legal Turtle
          if (peek == '.') more = false
        } else more = false
      }
      skipWs()
      expect('.')
    }

    private def term(subjectPos: Boolean): Term = {
      skipWs()
      peek match {
        case '<' => termOfIri(iriRef())
        case '"' | '\'' =>
          if (subjectPos) fail("literal in subject/predicate position")
          literal()
        case '_' => bnodeDoc match {
          case Some(id) =>
            // _:label → skolem IRI (same practical label subset as
            // NTriples.BnodeTok; per-file id keeps doc scoping)
            i += 1; expect(':')
            def word(c: Char) = (c >= 'A' && c <= 'Z') ||
              (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'
            val start = i
            if (i < n && word(doc.charAt(i))) i += 1
            else fail("malformed blank-node label")
            while (i < n && {
              val c = doc.charAt(i)
              word(c) || c == '.' || c == '-'
            }) i += 1
            // a label cannot END with '.': trailing dots are the
            // statement terminator (BLANK_NODE_LABEL grammar)
            while (doc.charAt(i - 1) == '.') i -= 1
            Term.TUri(NTriples.BnodeBase + id + "/" + doc.substring(start, i))
          case None => fail("blank nodes are outside the Term model — " +
            "load with bnodes = \"skolem\" or skolemize to IRIs before " +
            "import")
        }
        case '[' => fail("anonymous blank nodes ([...]) are outside the " +
          "Term model")
        case '(' => fail("RDF collections ((...)) are outside the " +
          "supported subset")
        case '{' => fail(if (trig) "unexpected '{' — a graph block needs " +
          "a label term or GRAPH keyword before it, or must start a " +
          "statement" else "'{' is TriG, not Turtle — use Trig.load " +
          "for named-graph documents")
        case c if c == '+' || c == '-' || c.isDigit =>
          if (subjectPos) fail("numeric literal in subject/predicate position")
          numericLiteral()
        case _ if startsWithWord("true") && !pnChar(i + 4) =>
          i += 4; Term.TBool(true)
        case _ if startsWithWord("false") && !pnChar(i + 5) =>
          i += 5; Term.TBool(false)
        case _ => prefixedName()
      }
    }

    private def pnChar(at: Int): Boolean =
      at < n && (Character.isLetterOrDigit(doc.charAt(at)) ||
        "_-.:".indexOf(doc.charAt(at)) >= 0)

    private def prefixedName(): Term = {
      val start = i
      while (i < n && doc.charAt(i) != ':' &&
        (Character.isLetterOrDigit(doc.charAt(i)) ||
          "_-.".indexOf(doc.charAt(i)) >= 0)) i += 1
      if (peek != ':') { i = start; fail("expected a term") }
      val pfx = doc.substring(start, i)
      i += 1
      val lstart = i
      while (pnChar(i) && doc.charAt(i) != ':') i += 1
      // PN_LOCAL may not END with '.', but may contain one
      while (i > lstart && doc.charAt(i - 1) == '.') i -= 1
      val local = doc.substring(lstart, i)
      val base = prefixes.getOrElse(pfx,
        fail(s"undeclared prefix '$pfx:'"))
      termOfIri(base + local)
    }

    private def literal(): Term = {
      val q = peek
      val long = i + 2 < n && doc.charAt(i + 1) == q && doc.charAt(i + 2) == q
      val lex =
        if (long) {
          i += 3
          // the body may contain up to two consecutive quote chars
          // (STRING_LITERAL_LONG grammar), so content can END in a
          // quote: consume the longest quote run at the first
          // triple-quote hit and treat only its FINAL three as the
          // terminator ("""abc"""" parses as abc" + terminator)
          val k = doc.indexOf(s"$q$q$q", i)
          if (k < 0) fail("unterminated long string literal")
          var end = k + 3
          while (end < n && doc.charAt(end) == q) end += 1
          val body = doc.substring(i, end - 3)
          i = end
          NtExpressions.echarUnescape(body)
        } else {
          i += 1
          val b = new java.lang.StringBuilder
          var done = false
          while (!done) {
            if (i >= n) fail("unterminated string literal")
            val c = doc.charAt(i)
            if (c == q) { i += 1; done = true }
            else if (c == '\n' || c == '\r')
              fail("raw newline in short string literal")
            else if (c == '\\') {
              if (i + 1 >= n) fail("dangling escape")
              b.append(doc.charAt(i)).append(doc.charAt(i + 1)); i += 2
            } else { b.append(c); i += 1 }
          }
          NtExpressions.echarUnescape(b.toString)
        }
      // lang tag or datatype
      if (peek == '@') {
        i += 1
        val start = i
        while (i < n && (Character.isLetterOrDigit(doc.charAt(i)) ||
          doc.charAt(i) == '-')) i += 1
        termOfLiteral(lex, doc.substring(start, i), "")
      } else if (i + 1 < n && doc.charAt(i) == '^' && doc.charAt(i + 1) == '^') {
        i += 2
        val dt = if (peek == '<') iriRef()
        else prefixedName() match {
          case Term.TUri(u)     => u
          case Term.TKeyword(k) => KwBase + k
          case other            => fail(s"datatype must be an IRI, got $other")
        }
        termOfLiteral(lex, "", dt)
      } else termOfLiteral(lex, "", "")
    }

    private def numericLiteral(): Term = {
      val start = i
      if (peek == '+' || peek == '-') i += 1
      var isDouble = false
      while (i < n && (doc.charAt(i).isDigit || doc.charAt(i) == '.' ||
          doc.charAt(i) == 'e' || doc.charAt(i) == 'E' ||
          ((doc.charAt(i) == '+' || doc.charAt(i) == '-') &&
            (doc.charAt(i - 1) == 'e' || doc.charAt(i - 1) == 'E')))) {
        // a '.' followed by non-digit terminates the statement, not
        // the number ("5." = long 5 then dot)
        if (doc.charAt(i) == '.' &&
            !(i + 1 < n && doc.charAt(i + 1).isDigit)) {
          val tok = doc.substring(start, i)
          return if (isDouble) Term.TDouble(tok.toDouble) else Term.TLong(tok.toLong)
        }
        if (doc.charAt(i) == '.' || doc.charAt(i) == 'e' ||
          doc.charAt(i) == 'E') isDouble = true
        i += 1
      }
      val tok = doc.substring(start, i)
      if (tok.isEmpty || tok == "+" || tok == "-") fail("malformed number")
      if (isDouble) Term.TDouble(tok.toDouble) else Term.TLong(tok.toLong)
    }
  }

  /** Parse a DataFrame of whole Turtle documents (a `value` string
    * column, one document per row — the [[load]] wholetext shape). */
  def parse(files: DataFrame): DataFrame = parse(files, "reject")

  /** As [[parse]] with a blank-node mode (`"reject"` / `"skolem"` —
    * see [[NTriples.parse]]; identical skolem IRI mapping and
    * per-file doc-id, so a dataset split across .nt and .ttl files
    * skolemizes consistently). */
  def parse(files: DataFrame, bnodes: String): DataFrame = {
    val skolem = NTriples.requireBnodeMode(bnodes)
    implicit val enc = Encoders.row(TripleDb.schema)
    files.select(col("value"),
        lower(hex(xxhash64(input_file_name()))).as("__doc"))
      .flatMap { r =>
        val docId = if (skolem) Some(r.getString(1)) else None
        parseDoc(r.getString(0), docId).iterator.map { case (s, p, o) =>
          Row(Term.toRow(s), Term.toRow(p), Term.toRow(o))
        }
      }.toDF("s", "p", "o")
  }

  /** Load a directory (or glob) of .ttl files into a [[TripleDb]] —
    * one parse task per file (Turtle is not splittable; see the
    * class note). Gzipped files decode transparently via the Hadoop
    * codecs, like .nt.gz. */
  def load(spark: SparkSession, path: String): TripleDb =
    TripleDb(parse(spark.read.option("wholetext", "true").text(path)))

  /** [[load]] with a blank-node mode (see [[parse]]). */
  def load(spark: SparkSession, path: String, bnodes: String): TripleDb =
    TripleDb(parse(spark.read.option("wholetext", "true").text(path), bnodes))

  // ---------------------------------------------------------------
  // Writer
  // ---------------------------------------------------------------

  /** PN_LOCAL-safe compression of the graft keyword base: emitted as a
    * `gk:` prefixed name when the local part is plain (no '/', no
    * leading/trailing '.', no escapes needed); otherwise the full
    * IRIREF stands (always legal). */
  private val KwPn = "^<urn:graft:kw/([A-Za-z_][A-Za-z0-9_-]*)>$"

  /** Serialize to Turtle: every part file is a self-contained document
    * (its own @prefix header), so the sink stays fully distributed.
    * Tokens are [[NTriples.termToken]]'s (N-Triples tokens are valid
    * Turtle) with `gk:` prefix compression for plain keyword IRIs.
    */
  def save(db: TripleDb, path: String): Unit = {
    val spark = db.df.sparkSession
    import spark.implicits._
    val lines = db.df
      .select(concat_ws(" ", tok("s"), tok("p"), tok("o"), lit(".")).as("v"))
      .as[String]
    lines.mapPartitions(it => Iterator(Header) ++ it)
      .write.mode("overwrite").text(path)
  }

  private def tok(c: String) =
    regexp_replace(NTriples.termToken(col(c)), KwPn, "gk:$1")
  private val Header = s"@prefix gk: <$KwBase> ."

  // ---------------------------------------------------------------
  // TriG (Turtle's named-graph superset) — the quad counterpart,
  // completing the interchange matrix: N-Triples/N-Quads for
  // line-parallel bulk, Turtle/TriG for the human-authored form.
  // ---------------------------------------------------------------

  /** Parse whole TriG documents (one per row) into (s, p, o, g) rows. */
  def parseTrig(files: DataFrame): DataFrame = parseTrig(files, "reject")

  /** As [[parseTrig]] with a blank-node mode (see [[parse]]); under
    * `"skolem"` bnodes are legal as graph labels too. */
  def parseTrig(files: DataFrame, bnodes: String): DataFrame = {
    val skolem = NTriples.requireBnodeMode(bnodes)
    implicit val enc = Encoders.row(QuadDb.schema)
    files.select(col("value"),
        lower(hex(xxhash64(input_file_name()))).as("__doc"))
      .flatMap { r =>
        val docId = if (skolem) Some(r.getString(1)) else None
        parseDocTrig(r.getString(0), docId).iterator.map { case (s, p, o, g) =>
          Row(Term.toRow(s), Term.toRow(p), Term.toRow(o), Term.toRow(g))
        }
      }.toDF("s", "p", "o", "g")
  }

  /** Load .trig files into a [[QuadDb]] — same per-file
    * parallelism contract as [[load]]. */
  def loadTrig(spark: SparkSession, path: String): QuadDb =
    QuadDb(parseTrig(
      spark.read.option("wholetext", "true").text(path)))

  /** [[loadTrig]] with a blank-node mode (see [[parse]]). */
  def loadTrig(spark: SparkSession, path: String, bnodes: String): QuadDb =
    QuadDb(parseTrig(
      spark.read.option("wholetext", "true").text(path), bnodes))

  /** Serialize a quad store to TriG: default-graph quads as plain
    * Turtle lines, named-graph quads as one-statement `<g> { … }`
    * blocks (TriG allows repeated blocks per graph, so the sink stays
    * a distributed per-row projection — no grouping shuffle). */
  def saveTrig(db: QuadDb, path: String): Unit = {
    val spark = db.df.sparkSession
    import spark.implicits._
    val line = concat_ws(" ", tok("s"), tok("p"), tok("o"), lit("."))
    val lines = db.df
      .select(when(col("g") === Term.lit(QuadDb.DefaultGraph), line)
        .otherwise(concat_ws(" ", tok("g"), lit("{"), line, lit("}")))
        .as("v"))
      .as[String]
    lines.mapPartitions(it => Iterator(Header) ++ it)
      .write.mode("overwrite").text(path)
  }
}
