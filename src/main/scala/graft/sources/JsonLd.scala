package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.core.{QuadDb, Term, TripleDb}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** JSON-LD interchange (flattened subset, line-delimited) — the one
  * widely-hit public RDF form the matrix lacked: schema.org embedded
  * data and API dumps ship flattened JSON-LD, and the flattened form
  * maps 1:1 onto quads with no graph traversal.
  *
  * Document shape: ONE JSON object per line. A plain line is a
  * flattened NODE OBJECT (`@id` + property keys); a line may instead
  * be a NAMED-GRAPH object (`@id` + `@graph`: an array of node
  * objects) — the standard flattened representation of a named graph.
  * The same `@id` may recur across lines (JSON-LD merges node objects
  * by id; so does a triple store).
  *
  * Supported subset (read):
  *   - `@id`: absolute IRI (decoded via the `urn:graft:` reserved
  *     bases, exactly [[NTriples]]/[[Turtle]]'s term mapping) or a
  *     `_:label` blank node under `bnodes = "skolem"`;
  *   - `@type`: IRI string or array of them → rdf:type triples;
  *   - property keys: absolute IRIs (a key without a scheme fails
  *     loudly — keyless JSON needs a `@context`, which is outside the
  *     subset);
  *   - values: JSON strings (plain literals), integral numbers
  *     (exact int64), fractional/exponent numbers (doubles),
  *     booleans, `{"@id": iri}` node references,
  *     `{"@value": v, "@language": tag}` / `{"@value": v, "@type":
  *     dt}` value objects (datatypes normalize like Turtle: xsd
  *     numerics/boolean/dateTime to native kinds, the opaque base to
  *     opaque terms), and ARRAYS of any of these (one quad each —
  *     flattened JSON-LD set semantics).
  *
  * `@context` is supported as a TERM/PREFIX-MAP subset: a top-level
  * object mapping simple names to absolute IRIs — gen-delim-
  * terminated entries expand COMPACT IRIS (`pfx:local`), any entry
  * aliases a BARE TERM (`"name": "http://schema.org/name"`, the
  * shape plain schema.org embeds use), and `@vocab` absolutizes the
  * remaining bare property keys and `@type` values. Every other
  * `@context` form (remote URLs, arrays, `@base`/`@language`,
  * expanded term definitions with `@container`/`@reverse`) FAILS
  * LOUDLY.
  *
  * Everything else also FAILS LOUDLY with the offending line: `@list`
  * (collections are outside the Term model), nested node objects with
  * properties (not flattened — flatten before import), `@graph`
  * inside `@graph`, non-object lines, a node object with no `@id`,
  * integral numbers past int64. Parse errors are never silent nils.
  *
  * Scale shape: line-delimited JSON-LD IS splittable (each line is
  * self-contained — no document state like Turtle's prefixes), so
  * reads parallelize per line-range split like N-Triples, not per
  * file. Writers group once by subject (and graph), emitting one
  * self-contained node-object line per subject — a single shuffle,
  * per-task memory bounded by one subject's facts.
  *
  * Term mapping is pinned against the other formats by the
  * cross-format spec test (a store loaded from .nt and the same data
  * as .jsonl must be term-identical).
  */
object JsonLd {

  private val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  private val Xsd = "http://www.w3.org/2001/XMLSchema#"
  private val KwBase = "urn:graft:kw/"
  private val RelBase = "urn:graft:rel/"
  private val NilIri = "urn:graft:nil"
  private val OpaqueBase = "urn:graft:opaque/"

  // jackson is Spark's own JSON engine (always on the executor
  // classpath); one mapper per JVM, thread-safe for read/write
  @transient private lazy val mapper = new ObjectMapper()

  private def fail(line: String, msg: String): Nothing =
    throw new IllegalArgumentException(
      s"JSON-LD parse error: $msg — in line: " +
        line.substring(0, math.min(line.length, 120)))

  /** A keyword node (`@id`/`@type` member) as its string — anything
    * non-textual (a number, an object) fails loudly instead of
    * surfacing as a null-IRI NPE. */
  private def asIdString(line: String, v: JsonNode, kw: String): String =
    if (v != null && v.isTextual) v.textValue()
    else fail(line, s"$kw must be an IRI string, got $v")

  /** `@id` / node-reference string → term: IRIs via the shared
    * reserved-base mapping, `_:label` via the skolem scheme (or a
    * loud refusal, the [[NTriples]] contract). */
  private def idTerm(line: String, id: String,
                     bnodeDoc: Option[String]): Term =
    if (id.startsWith("_:")) bnodeDoc match {
      case Some(doc) =>
        Term.TUri(NTriples.BnodeBase + doc + "/" + id.substring(2))
      case None => fail(line, s"blank node '$id' is outside the Term " +
        "model — load with bnodes = \"skolem\" or skolemize before import")
    }
    else if (!id.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*"))
      fail(line, s"'$id' is not an absolute IRI (relative-IRI / @base " +
        "resolution is outside the subset)")
    else Turtle.termOfIri(id)

  /** One JSON value → the object terms it denotes (arrays fan out). */
  private def valueTerms(line: String, v: JsonNode,
                         bnodeDoc: Option[String]): Seq[Term] =
    if (v.isArray) v.elements().asScala.toSeq
      .flatMap(valueTerms(line, _, bnodeDoc))
    else if (v.isTextual) Seq(Term.TString(v.textValue()))
    else if (v.isBoolean) Seq(Term.TBool(v.booleanValue()))
    else if (v.isNumber) Seq(numberTerm(line, v))
    else if (v.isObject) {
      if (v.has("@list"))
        fail(line, "@list collections are outside the Term model")
      if (v.has("@value")) {
        // invalid JSON-LD (@language + @type may not co-occur) and
        // unrecognized members (@index, @direction, property keys) fail
        // loudly like the node-reference branch — silently dropping
        // them would break the writers' re-export identity contract
        if (v.has("@language") && v.has("@type")) fail(line,
          "a @value object cannot carry BOTH @language and @type " +
            "(invalid JSON-LD)")
        val extra = v.fieldNames().asScala
          .filterNot(k => k == "@value" || k == "@language" || k == "@type")
          .toSeq
        if (extra.nonEmpty) fail(line,
          s"unsupported members beside @value: ${extra.mkString(", ")} " +
            "(the subset admits only @language or @type)")
        val inner = v.get("@value")
        val lex =
          if (inner.isTextual) inner.textValue()
          else if (inner.isNumber || inner.isBoolean) inner.asText()
          else fail(line, s"unsupported @value payload: $inner")
        if (v.has("@language"))
          Seq(Term.TLangString(lex, asIdString(line, v.get("@language"), "@language")))
        else if (v.has("@type"))
          Seq(Turtle.termOfLiteral(lex, "", asIdString(line, v.get("@type"), "@type")))
        else if (inner.isNumber) Seq(numberTerm(line, inner))
        else if (inner.isBoolean) Seq(Term.TBool(inner.booleanValue()))
        else Seq(Term.TString(lex))
      } else if (v.has("@id")) {
        val extra = v.fieldNames().asScala.filterNot(_ == "@id")
        if (extra.nonEmpty) fail(line,
          "a node object VALUE with properties is not flattened " +
            s"(found ${extra.mkString(", ")} beside @id) — flatten " +
            "before import")
        Seq(idTerm(line, asIdString(line, v.get("@id"), "@id"), bnodeDoc))
      } else fail(line, s"unsupported value object: $v")
    }
    else if (v.isNull) fail(line,
      "JSON null values are not terms (JSON-LD drops null-valued " +
        "entries at expansion — expand/flatten before import)")
    else fail(line, s"unsupported JSON value: $v")

  private def numberTerm(line: String, v: JsonNode): Term =
    if (v.isIntegralNumber) {
      if (!v.canConvertToLong) fail(line,
        s"integral number ${v.asText()} exceeds int64 (exact-integer " +
          "subset; ship it as a typed-literal string)")
      Term.TLong(v.longValue())
    } else Term.TDouble(v.doubleValue())

  /** The parsed `@context` subset: `terms` maps simple names to
    * absolute IRIs — an entry whose IRI ends in a gen-delim works as
    * a PREFIX (`pfx:local` → base+local, JSON-LD's compact-IRI rule)
    * and any entry works as a bare TERM ALIAS (`name` → its IRI,
    * JSON-LD's string term definition — the shape plain schema.org
    * embeds use); `vocab` is the `@vocab` default that absolutizes
    * remaining bare property keys and `@type` values. */
  private[sources] final case class Ctx(terms: Map[String, String],
                                        vocab: Option[String]) {
    def ++(inner: Ctx): Ctx =
      Ctx(terms ++ inner.terms, inner.vocab.orElse(vocab))
    def isEmpty: Boolean = terms.isEmpty && vocab.isEmpty
  }
  private[sources] val NoCtx = Ctx(Map.empty, None)

  /** The `@context` subset: a top-level JSON object whose members map
    * simple names to absolute-IRI strings (gen-delim-terminated →
    * usable as a prefix; any → usable as a bare term alias), plus
    * `@vocab` mapping to a gen-delim-terminated absolute IRI.
    * Everything else a real `@context` can carry fails LOUDLY: a
    * remote-context URL string, arrays, `@base`/`@language` defaults,
    * and expanded term definitions (objects — `@container`/`@reverse`
    * / type-scoped semantics need a full JSON-LD processor). */
  private def parseContext(line: String, node: JsonNode): Ctx = {
    if (!node.has("@context")) return NoCtx
    val ctx = node.get("@context")
    if (!ctx.isObject) fail(line,
      "@context must be a term/prefix-map OBJECT in this subset " +
        "(remote context URLs / arrays need a JSON-LD processor)")
    var vocab: Option[String] = None
    val terms = ctx.properties().asScala.flatMap { e =>
      val (name, v) = (e.getKey, e.getValue)
      if (name == "@vocab") {
        if (!v.isTextual) fail(line, "@vocab must be an IRI string")
        val iri = v.textValue()
        if (!iri.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*") ||
            !"/#:".contains(iri.last)) fail(line,
          s"@vocab must be an absolute IRI ending in '/', '#', or " +
            s"':' (got '$iri')")
        vocab = Some(iri)
        None
      } else {
        if (name.startsWith("@")) fail(line,
          s"@context keyword '$name' is outside the subset " +
            "(@base/@language need full context processing)")
        if (name.contains(":")) fail(line,
          s"@context term '$name' must be a simple name")
        if (!v.isTextual) fail(line,
          s"@context entry '$name' must map to an IRI string " +
            "(expanded term definitions — @container/@reverse/@id " +
            "objects — are outside the subset)")
        val iri = v.textValue()
        if (!iri.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*")) fail(line,
          s"@context term '$name' must map to an absolute IRI " +
            s"(got '$iri')")
        Some(name -> iri)
      }
    }.toMap
    Ctx(terms, vocab)
  }

  /** Expand a property key / `@type` value through the line's
    * context: exact term alias first, then compact IRI (`pfx:local`
    * with a declared gen-delim prefix), then `@vocab` for remaining
    * bare names; anything else passes through (absolute-IRI
    * validation happens downstream, so unresolved keys still fail
    * loudly). */
  private def expand(ctx: Ctx, s: String): String =
    ctx.terms.get(s) match {
      case Some(iri) => iri
      case None =>
        val i = s.indexOf(':')
        if (i <= 0) ctx.vocab match {
          case Some(v) if i < 0 => v + s
          case _                => s
        }
        else ctx.terms.get(s.substring(0, i)) match {
          // compact-IRI expansion requires a prefix-SHAPED base
          case Some(base) if "/#:".contains(base.last) =>
            base + s.substring(i + 1)
          case _ => s
        }
    }

  /** One flattened node object → its quads in graph `g`. */
  private def nodeQuads(line: String, node: JsonNode, g: Term,
                        bnodeDoc: Option[String],
                        outerCtx: Ctx): Seq[(Term, Term, Term, Term)] = {
    if (!node.isObject) fail(line, "each line must be a JSON object")
    val ctx = outerCtx ++ parseContext(line, node)
    if (!node.has("@id")) fail(line, "node object has no @id (the " +
      "flattened subset requires explicit ids; anonymous nodes need " +
      "skolemization upstream)")
    val s = idTerm(line, asIdString(line, node.get("@id"), "@id"), bnodeDoc)
    node.properties().asScala.toSeq.flatMap { e =>
      val (key, v) = (e.getKey, e.getValue)
      key match {
        case "@id" | "@context" => Nil
        case "@type" =>
          val ts = if (v.isArray) v.elements().asScala.toSeq else Seq(v)
          ts.map(t => (s, Turtle.termOfIri(RdfType),
            idTerm(line, expand(ctx, asIdString(line, t, "@type")),
              bnodeDoc), g))
        case "@graph" => fail(line, "@graph inside a node object — " +
          "named graphs nest exactly one level (a line is either a " +
          "node object or a graph object)")
        case k if k.startsWith("@") =>
          fail(line, s"unsupported keyword $k")
        case k =>
          val p = idTerm(line, expand(ctx, k), bnodeDoc)
          valueTerms(line, v, bnodeDoc).map(o => (s, p, o, g))
      }
    }
  }

  /** One line → quads: a plain node object lands in the default
    * graph; an `{"@id": g, "@graph": [...]}` object scopes its nodes
    * to the named graph. */
  private[sources] def parseLine(line: String,
      bnodeDoc: Option[String]): Seq[(Term, Term, Term, Term)] = {
    val trimmed = line.trim
    if (trimmed.isEmpty) return Nil
    val node = try mapper.readTree(trimmed) catch {
      case e: Exception => fail(line, s"malformed JSON (${e.getMessage})")
    }
    if (node.isObject && node.has("@graph")) {
      val extra = node.properties().asScala.map(_.getKey)
        .filterNot(k => k == "@id" || k == "@graph" || k == "@context")
      if (extra.nonEmpty) fail(line,
        s"a graph object carries only @id + @graph (found " +
          s"${extra.mkString(", ")})")
      if (!node.has("@id")) fail(line, "graph object has no @id")
      val ctx = parseContext(line, node) // scopes over the nested nodes
      val g = idTerm(line, asIdString(line, node.get("@id"), "@id"), bnodeDoc)
      val arr = node.get("@graph")
      if (!arr.isArray) fail(line, "@graph must be an array of node objects")
      arr.elements().asScala.toSeq
        .flatMap(nodeQuads(line, _, g, bnodeDoc, ctx))
    } else nodeQuads(line, node, QuadDb.DefaultGraph, bnodeDoc, NoCtx)
  }

  // ---------------------------------------------------------------
  // Readers
  // ---------------------------------------------------------------

  /** Parse a DataFrame of JSON-LD lines (a `value` string column —
    * the line-parallel `spark.read.text` shape) to (s, p, o) rows.
    * Graph objects are legal input; their graph scoping is DROPPED
    * (triple view — use [[parseQuads]] to keep it). */
  def parse(lines: DataFrame, bnodes: String = "reject"): DataFrame = {
    val skolem = NTriples.requireBnodeMode(bnodes)
    implicit val enc = Encoders.row(TripleDb.schema)
    lines.select(col("value"),
        lower(hex(xxhash64(input_file_name()))).as("__doc"))
      .flatMap { r =>
        val docId = if (skolem) Some(r.getString(1)) else None
        parseLine(r.getString(0), docId).iterator.map { case (s, p, o, _) =>
          Row(Term.toRow(s), Term.toRow(p), Term.toRow(o))
        }
      }.toDF("s", "p", "o")
  }

  /** As [[parse]], keeping graph scoping → (s, p, o, g) rows. */
  def parseQuads(lines: DataFrame, bnodes: String = "reject"): DataFrame = {
    val skolem = NTriples.requireBnodeMode(bnodes)
    implicit val enc = Encoders.row(QuadDb.schema)
    lines.select(col("value"),
        lower(hex(xxhash64(input_file_name()))).as("__doc"))
      .flatMap { r =>
        val docId = if (skolem) Some(r.getString(1)) else None
        parseLine(r.getString(0), docId).iterator.map { case (s, p, o, g) =>
          Row(Term.toRow(s), Term.toRow(p), Term.toRow(o), Term.toRow(g))
        }
      }.toDF("s", "p", "o", "g")
  }

  /** Load .jsonl/.jsonld files into a [[TripleDb]] — line-parallel
    * (splittable, unlike Turtle; gzipped files decode via the Hadoop
    * codecs but gzip forfeits splitting, as everywhere). */
  def load(spark: SparkSession, path: String,
           bnodes: String = "reject"): TripleDb =
    TripleDb(parse(spark.read.text(path), bnodes))

  /** Load into a [[QuadDb]] (graph objects scope their nodes). */
  def loadQuads(spark: SparkSession, path: String,
                bnodes: String = "reject"): QuadDb =
    QuadDb(parseQuads(spark.read.text(path), bnodes))

  // ---------------------------------------------------------------
  // Writers
  // ---------------------------------------------------------------

  /** A term as its JSON-LD value fragment (the reader's exact
    * inverse; doubles ride a typed @value string like the N-Triples
    * writer — `toDouble` round-trips, JSON number formatting would
    * not be byte-stable across writers). */
  private def valueJson(t: Term): String = t match {
    case Term.TString(s)          => mapper.writeValueAsString(s)
    case Term.TLong(v)            => v.toString
    case Term.TBool(v)            => v.toString
    case Term.TDouble(v)          =>
      s"""{"@value":${mapper.writeValueAsString(v.toString)},""" +
        s""""@type":"${Xsd}double"}"""
    case Term.TLangString(lex, lg) =>
      s"""{"@value":${mapper.writeValueAsString(lex)},""" +
        s""""@language":${mapper.writeValueAsString(lg)}}"""
    case Term.TTyped(lex, dt)     =>
      s"""{"@value":${mapper.writeValueAsString(lex)},""" +
        s""""@type":${mapper.writeValueAsString(dt)}}"""
    case Term.TDate(iso)          =>
      s"""{"@value":${mapper.writeValueAsString(iso)},""" +
        s""""@type":"${Xsd}dateTime"}"""
    case Term.TOpaque(tag, b64)   =>
      s"""{"@value":${mapper.writeValueAsString(b64)},""" +
        s""""@type":${mapper.writeValueAsString(OpaqueBase + tag)}}"""
    case other => s"""{"@id":${mapper.writeValueAsString(iriOf(other))}}"""
  }

  /** IRI body of a node-position term (the [[NTriples.termToken]]
    * scheme: keywords/relatives/nil under the reserved bases). */
  private def iriOf(t: Term): String = t match {
    case Term.TNil         => NilIri
    case Term.TKeyword(n)  => KwBase + n
    case Term.TUri(u)      =>
      if (u.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*")) u else RelBase + u
    case other => throw new IllegalArgumentException(
      s"cannot serialize $other in a node position")
  }

  /** One subject's (pred, obj) facts → a flattened node-object line.
    * Predicates sort for a deterministic byte stream; multi-valued
    * predicates emit one JSON array (never duplicate keys — parsers
    * disagree on those). */
  private def nodeLine(s: Term, pos: Seq[(Term, Term)]): String = {
    val sj = mapper.writeValueAsString(iriOf(s))
    val props = pos.groupBy(_._1).toSeq
      .map { case (p, vs) =>
        val key = mapper.writeValueAsString(iriOf(p))
        val vals = vs.map(v => valueJson(v._2)).sorted
        val vj = if (vals.size == 1) vals.head
          else vals.mkString("[", ",", "]")
        s"$key:$vj"
      }.sorted
    (s"""{"@id":$sj""" +: props).mkString("", ",", "}")
  }

  /** Serialize to line-delimited flattened JSON-LD: one node object
    * per subject per line. ONE groupBy(subject) shuffle; per-task
    * memory is one subject's facts. */
  def save(db: TripleDb, path: String): Unit = {
    val spark = db.df.sparkSession
    import spark.implicits._
    db.df.groupBy(col("s"))
      .agg(collect_list(struct(col("p"), col("o"))).as("po"))
      .map { r =>
        val s = Term.fromRow(r.getStruct(0))
        val pos = r.getSeq[Row](1).map(x =>
          (Term.fromRow(x.getStruct(0)), Term.fromRow(x.getStruct(1))))
        nodeLine(s, pos)
      }.write.mode("overwrite").text(path)
  }

  /** Serialize a quad store: default-graph subjects as plain node
    * lines, named graphs as `{"@id": g, "@graph": [node]}` lines —
    * one line per (graph, subject), so a graph may span lines (the
    * reader, and JSON-LD's merge semantics, treat that as one
    * graph). ONE groupBy(g, s) shuffle. */
  def saveQuads(db: QuadDb, path: String): Unit = {
    val spark = db.df.sparkSession
    import spark.implicits._
    db.df.groupBy(col("g"), col("s"))
      .agg(collect_list(struct(col("p"), col("o"))).as("po"))
      .map { r =>
        val g = Term.fromRow(r.getStruct(0))
        val s = Term.fromRow(r.getStruct(1))
        val pos = r.getSeq[Row](2).map(x =>
          (Term.fromRow(x.getStruct(0)), Term.fromRow(x.getStruct(1))))
        val node = nodeLine(s, pos)
        if (g == QuadDb.DefaultGraph) node
        else {
          val gj = mapper.writeValueAsString(iriOf(g))
          s"""{"@id":$gj,"@graph":[$node]}"""
        }
      }.write.mode("overwrite").text(path)
  }
}
