package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.core.Term
import graft.core.Term._
import graft.functions.NtExpressions
import org.apache.spark.sql.{functions, Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import scala.jdk.CollectionConverters._

/** W3C SPARQL result-set serialization — the standard interop edge
  * for anything downstream of a SELECT: `application/sparql-results
  * +json` (SPARQL 1.1 Query Results JSON Format) and
  * `application/sparql-results+xml` (SPARQL Query Results XML Format)
  * with readers for round-trips, and the CSV/TSV formats (SPARQL 1.1
  * Query Results CSV and TSV Formats). All four act on ANY `selectDf`
  * solution frame (term-struct columns; SQL NULL = unbound), so every
  * store layout composes — dict stores are decoded by then.
  *
  * Fidelity per spec: JSON, XML, and TSV are LOSSLESS for the Term model
  * (typed round-trip through the shared `urn:graft:` reserved-base
  * mapping — the same pin as the RDF interchange matrix); CSV is the
  * spec's intentionally LOSSY human-facing form (bare lexical forms,
  * no types) and is writer-only. Blank-node bindings in foreign JSON
  * fail loudly like everywhere else (skolemize upstream).
  *
  * Scale shape: writers are per-partition streaming — each part file
  * is a COMPLETE document of its partition's bindings (the Turtle
  * writer's per-part-header contract; JSON cannot be line-spliced, so
  * self-contained parts are what keeps the sink distributed), with
  * per-task memory bounded by ONE binding row. The JSON reader
  * parallelizes per FILE (a sparql-results+json document is one JSON
  * value — not splittable, the same contract as Turtle); the TSV
  * reader is line-parallel like N-Triples. `toJsonDoc` is the
  * driver-side single-document form for genuinely bounded results
  * (the actual HTTP-response shape).
  */
object SparqlResults {

  private val Xsd = "http://www.w3.org/2001/XMLSchema#"
  private val KwBase = "urn:graft:kw/"
  private val RelBase = "urn:graft:rel/"
  private val NilIri = "urn:graft:nil"
  private val OpaqueBase = "urn:graft:opaque/"

  @transient private lazy val mapper = new ObjectMapper()

  // ----------------------------------------------------------- JSON

  /** The IRI body a node-position term serializes to (the interchange
    * writers' reserved-base scheme — [[NTriples]]' exactly). */
  private def iriOf(t: Term): String = t match {
    case TNil        => NilIri
    case TKeyword(n) => KwBase + n
    case TUri(u) =>
      if (u.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*")) u else RelBase + u
    case other => throw new IllegalArgumentException(
      s"not a node term: $other")
  }

  /** One bound term as its sparql-results+json RDF-term object. */
  private def termJson(t: Term): String = {
    def j(s: String) = mapper.writeValueAsString(s)
    def lit(lex: String, dt: String): String =
      s"""{"type":"literal","value":${j(lex)},"datatype":${j(dt)}}"""
    t match {
      case TNil | TKeyword(_) | TUri(_) =>
        s"""{"type":"uri","value":${j(iriOf(t))}}"""
      case TString(s2) => s"""{"type":"literal","value":${j(s2)}}"""
      case TLangString(lex, lang) =>
        s"""{"type":"literal","value":${j(lex)},"xml:lang":${j(lang)}}"""
      case TLong(v)   => lit(v.toString, Xsd + "integer")
      case TDouble(v) => lit(v.toString, Xsd + "double")
      case TBool(v)   => lit(v.toString, Xsd + "boolean")
      case TDate(iso) => lit(iso, Xsd + "dateTime")
      case TTyped(lex, dt)   => lit(lex, dt)
      case TOpaque(tag, b64) => lit(b64, OpaqueBase + tag)
    }
  }

  /** One solution row as a JSON binding object (unbound = absent key,
    * per spec). */
  private def bindingJson(vars: Seq[String], r: Row): String =
    vars.indices.flatMap { i =>
      if (r.isNullAt(i)) None
      else Some(mapper.writeValueAsString(vars(i)) + ":" +
        termJson(Term.fromRow(r.getStruct(i))))
    }.mkString("{", ",", "}")

  private def headJson(vars: Seq[String]): String =
    vars.map(mapper.writeValueAsString)
      .mkString("""{"head":{"vars":[""", ",", """]},"results":{"bindings":[""")

  /** A response BODY is ONE driver string — bound the collect so an
    * oversized result is a loud message pointing at the distributed
    * writer, never a silent driver OOM. Probe = limit(max+1): when the
    * result fits, the same rows the collect needed anyway; when it
    * does not, the job stops at the bound. */
  val BodyMaxRowsKey = "spark.graft.responseBody.maxRows"
  private val BodyMaxRowsDefault = 1000000L
  private[graft] def boundedRows(df: DataFrame,
                                 writer: String): Array[Row] = {
    val max = df.sparkSession.conf
      .get(BodyMaxRowsKey, BodyMaxRowsDefault.toString).toLong
    val lim = math.min(max + 1, Int.MaxValue.toLong).toInt
    val rows = df.limit(lim).collect()
    if (rows.length > max) throw new graft.dsl.InvalidBgp(
      s"result exceeds the single-document response bound ($max rows) " +
        s"— write it distributed via $writer, or raise $BodyMaxRowsKey")
    rows
  }

  /** The whole result set as ONE sparql-results+json document string —
    * the HTTP-response shape, for bounded results (collects,
    * [[boundedRows]]-guarded). */
  def toJsonDoc(sol: DataFrame): String = {
    val vars = sol.columns.toSeq
    boundedRows(sol, "SparqlResults.saveJson").iterator
      .map(bindingJson(vars, _))
      .mkString(headJson(vars), ",", "]}}")
  }

  /** Distributed writer: each part file is a complete
    * sparql-results+json document over its partition's bindings.
    * Streaming per row — per-task memory is one binding. */
  def saveJson(sol: DataFrame, path: String): Unit = {
    val spark = sol.sparkSession
    import spark.implicits._
    val vars = sol.columns.toSeq
    sol.mapPartitions { it =>
      var first = true
      val body = it.map { r =>
        val sep = if (first) "" else ","
        first = false
        sep + bindingJson(vars, r)
      }
      Iterator(headJson(vars)) ++ body ++ Iterator("]}}")
    }(Encoders.STRING).write.mode("overwrite").text(path)
  }

  // ---- the ASK result-document forms (§ "boolean" results) ----

  /** An ASK result as a sparql-results+json document. */
  def askJsonDoc(b: Boolean): String =
    s"""{"head":{},"boolean":$b}"""

  /** Parse an ASK sparql-results+json document (loud when the
    * document is a SELECT result set — route those through
    * [[loadJson]]). */
  def parseAskJsonDoc(doc: String): Boolean = {
    val root = try mapper.readTree(doc) catch {
      case e: Exception => failJson(s"malformed JSON (${e.getMessage})")
    }
    Option(root.get("boolean")) match {
      case Some(b) if b.isBoolean => b.booleanValue()
      case Some(other) => failJson(s"non-boolean 'boolean' member: $other")
      case None => failJson("no boolean member (a SELECT result set " +
        "reads via loadJson)")
    }
  }

  /** An ASK result as a sparql-results+xml document. */
  def askXmlDoc(b: Boolean): String =
    """<?xml version="1.0"?>""" +
      """<sparql xmlns="http://www.w3.org/2005/sparql-results#">""" +
      s"<head/><boolean>$b</boolean></sparql>"

  /** Parse an ASK sparql-results+xml document. */
  def parseAskXmlDoc(doc: String): Boolean = {
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    val dom = try dbf.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(doc.getBytes("UTF-8")))
    catch { case e: Exception => failXml(s"malformed XML (${e.getMessage})") }
    val root = dom.getDocumentElement
    if (root.getLocalName != "sparql") failXml("not a sparql document")
    val kids = root.getChildNodes
    var out: Option[Boolean] = None
    for (i <- 0 until kids.getLength) kids.item(i) match {
      case e: org.w3c.dom.Element if e.getLocalName == "boolean" =>
        e.getTextContent.trim match {
          case "true"  => out = Some(true)
          case "false" => out = Some(false)
          case other   => failXml(s"non-boolean <boolean> content: $other")
        }
      case _ =>
    }
    out.getOrElse(failXml("no boolean element (a SELECT result set " +
      "reads via loadXml)"))
  }

  private def failJson(msg: String): Nothing =
    throw new IllegalArgumentException(s"sparql-results+json: $msg")

  /** One RDF-term JSON object → a term (the writer's exact inverse;
    * xsd-typed literals normalize to native kinds through the shared
    * [[Turtle.termOfLiteral]] mapping). */
  private def jsonTerm(v: JsonNode): Term = {
    val tpe = Option(v.get("type")).map(_.asText()).getOrElse(
      failJson(s"binding object without a type: $v"))
    val value = Option(v.get("value")).map(_.asText()).getOrElse(
      failJson(s"binding object without a value: $v"))
    tpe match {
      case "uri" => Turtle.termOfIri(value)
      case "literal" | "typed-literal" =>
        val lang = Option(v.get("xml:lang")).map(_.asText()).getOrElse("")
        val dt = Option(v.get("datatype")).map(_.asText()).getOrElse("")
        if (lang.nonEmpty && dt.nonEmpty)
          failJson(s"literal with BOTH xml:lang and datatype: $v")
        Turtle.termOfLiteral(value, lang, dt)
      case "bnode" => failJson("blank-node bindings are outside the " +
        "Term model — skolemize upstream")
      case other => failJson(s"unknown term type '$other'")
    }
  }

  /** Parse ONE sparql-results+json document → (vars, solution rows). */
  private[graft] def parseJsonDoc(doc: String): (Seq[String], Seq[Seq[Term]]) = {
    val root = try mapper.readTree(doc) catch {
      case e: Exception => failJson(s"malformed JSON (${e.getMessage})")
    }
    val head = Option(root.get("head")).getOrElse(failJson("no head"))
    val vars = Option(head.get("vars"))
      .getOrElse(failJson("no head.vars"))
      .elements().asScala.map(_.asText()).toSeq
    val bindings = Option(root.get("results"))
      .flatMap(r => Option(r.get("bindings")))
      .getOrElse(failJson("no results.bindings"))
    val rows = bindings.elements().asScala.map { b =>
      vars.map(v => Option(b.get(v)).map(jsonTerm).orNull)
    }.toSeq
    (vars, rows)
  }

  /** Reader: a directory of part documents (or one file) → a solution
    * frame with the writer's column order. Per-FILE parallel; every
    * part must carry the same vars (loud otherwise). */
  def loadJson(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.option("wholetext", "true").text(path)
    // the schema needs the var list before the distributed pass: one
    // driver-side parse of one part's HEAD (not its bindings)
    val firstDoc = files.limit(1).collect()
    if (firstDoc.isEmpty) failJson(s"no documents under $path")
    val vars = parseJsonDoc(firstDoc(0).getString(0))._1
    val schema = StructType(vars.map(v =>
      StructField(v, Term.schema, nullable = true)))
    implicit val enc = Encoders.row(schema)
    files.flatMap { r =>
      val (docVars, rows) = parseJsonDoc(r.getString(0))
      if (docVars != vars) failJson(
        s"part documents disagree on vars: $docVars vs $vars")
      rows.iterator.map(ts => Row(ts.map(t =>
        if (t == null) null else Term.toRow(t)): _*))
    }
  }

  // ------------------------------------------------------------ XML

  private def xmlEsc(s: String): String = {
    val b = new java.lang.StringBuilder(s.length + 8)
    s.foreach {
      case '&' => b.append("&amp;")
      case '<' => b.append("&lt;")
      case '>' => b.append("&gt;")
      case '"' => b.append("&quot;")
      case c   => b.append(c)
    }
    b.toString
  }

  /** One bound term as its sparql-results+xml binding element. */
  private def termXml(name: String, t: Term): String = {
    def lit(lex: String, attrs: String): String =
      s"<literal$attrs>${xmlEsc(lex)}</literal>"
    val body = t match {
      case TNil | TKeyword(_) | TUri(_) =>
        s"<uri>${xmlEsc(iriOf(t))}</uri>"
      case TString(s2) => lit(s2, "")
      case TLangString(lex, lang) =>
        lit(lex, s""" xml:lang="${xmlEsc(lang)}"""")
      case TLong(v)   => lit(v.toString, s""" datatype="${Xsd}integer"""")
      case TDouble(v) => lit(v.toString, s""" datatype="${Xsd}double"""")
      case TBool(v)   => lit(v.toString, s""" datatype="${Xsd}boolean"""")
      case TDate(iso) => lit(iso, s""" datatype="${Xsd}dateTime"""")
      case TTyped(lex, dt)   => lit(lex, s""" datatype="${xmlEsc(dt)}"""")
      case TOpaque(tag, b64) =>
        lit(b64, s""" datatype="${xmlEsc(OpaqueBase + tag)}"""")
    }
    s"""<binding name="${xmlEsc(name)}">$body</binding>"""
  }

  private def xmlHead(vars: Seq[String]): String =
    """<?xml version="1.0"?>""" +
      """<sparql xmlns="http://www.w3.org/2005/sparql-results#"><head>""" +
      vars.map(v => s"""<variable name="${xmlEsc(v)}"/>""").mkString +
      "</head><results>"

  private def resultXml(vars: Seq[String], r: Row): String =
    vars.indices.flatMap { i =>
      if (r.isNullAt(i)) None
      else Some(termXml(vars(i), Term.fromRow(r.getStruct(i))))
    }.mkString("<result>", "", "</result>")

  /** The whole result set as ONE sparql-results+xml document string
    * (the HTTP-response shape, bounded results — collects). */
  def toXmlDoc(sol: DataFrame): String = {
    val vars = sol.columns.toSeq
    boundedRows(sol, "SparqlResults.saveXml").iterator
      .map(resultXml(vars, _))
      .mkString(xmlHead(vars), "", "</results></sparql>")
  }

  /** Distributed XML writer — the per-part-complete-document contract
    * of [[saveJson]]. */
  def saveXml(sol: DataFrame, path: String): Unit = {
    val spark = sol.sparkSession
    import spark.implicits._
    val vars = sol.columns.toSeq
    sol.mapPartitions { it =>
      Iterator(xmlHead(vars)) ++ it.map(resultXml(vars, _)) ++
        Iterator("</results></sparql>")
    }(Encoders.STRING).write.mode("overwrite").text(path)
  }

  private def failXml(msg: String): Nothing =
    throw new IllegalArgumentException(s"sparql-results+xml: $msg")

  /** Parse ONE sparql-results+xml document (JDK DOM — no extra
    * dependency) → (vars, solution rows). */
  private[graft] def parseXmlDoc(doc: String): (Seq[String], Seq[Seq[Term]]) = {
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    val dom = try dbf.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(doc.getBytes("UTF-8")))
    catch { case e: Exception => failXml(s"malformed XML (${e.getMessage})") }
    val Ns = "http://www.w3.org/2005/sparql-results#"
    def children(n: org.w3c.dom.Node, name: String): Seq[org.w3c.dom.Element] = {
      val out = Seq.newBuilder[org.w3c.dom.Element]
      val kids = n.getChildNodes
      for (i <- 0 until kids.getLength) kids.item(i) match {
        case e: org.w3c.dom.Element
          if e.getLocalName == name && e.getNamespaceURI == Ns => out += e
        case _ =>
      }
      out.result()
    }
    val root = dom.getDocumentElement
    if (root.getLocalName != "sparql" || root.getNamespaceURI != Ns)
      failXml(s"root element is not sparql-results <sparql>: " +
        s"${root.getTagName}")
    val head = children(root, "head").headOption.getOrElse(failXml("no head"))
    val vars = children(head, "variable").map(_.getAttribute("name"))
    if (vars.isEmpty) failXml("no head variables")
    val results = children(root, "results").headOption
      .getOrElse(failXml("no results (ASK documents carry <boolean> — " +
        "run ASK through Sparql.ask)"))
    val rows = children(results, "result").map { res =>
      val byName = children(res, "binding").map { b =>
        val name = b.getAttribute("name")
        val uri = children(b, "uri").headOption
        val lit = children(b, "literal").headOption
        val bn = children(b, "bnode").headOption
        if (bn.nonEmpty) failXml("blank-node bindings are outside the " +
          "Term model — skolemize upstream")
        val term = (uri, lit) match {
          case (Some(u), None) => Turtle.termOfIri(u.getTextContent)
          case (None, Some(l)) =>
            val lang = Option(l.getAttributeNS(
              "http://www.w3.org/XML/1998/namespace", "lang"))
              .filter(_.nonEmpty).getOrElse("")
            val dt = Option(l.getAttribute("datatype"))
              .filter(_.nonEmpty).getOrElse("")
            if (lang.nonEmpty && dt.nonEmpty)
              failXml(s"literal with BOTH xml:lang and datatype")
            Turtle.termOfLiteral(l.getTextContent, lang, dt)
          case _ => failXml(s"binding '$name' needs exactly one of " +
            "<uri>/<literal>")
        }
        name -> term
      }.toMap
      vars.map(v => byName.getOrElse(v, null))
    }
    (vars, rows)
  }

  /** XML reader — per-FILE parallel, same contract as [[loadJson]]. */
  def loadXml(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.option("wholetext", "true").text(path)
    val firstDoc = files.limit(1).collect()
    if (firstDoc.isEmpty) failXml(s"no documents under $path")
    val vars = parseXmlDoc(firstDoc(0).getString(0))._1
    val schema = StructType(vars.map(v =>
      StructField(v, Term.schema, nullable = true)))
    implicit val enc = Encoders.row(schema)
    files.flatMap { r =>
      val (docVars, rows) = parseXmlDoc(r.getString(0))
      if (docVars != vars) failXml(
        s"part documents disagree on vars: $docVars vs $vars")
      rows.iterator.map(ts => Row(ts.map(t =>
        if (t == null) null else Term.toRow(t)): _*))
    }
  }

  // ------------------------------------------------------------ CSV

  /** A term-struct column as its CSV cell (SPARQL 1.1 CSV format:
    * IRIs bare, literals as raw lexical forms — the spec's lossy
    * human-facing encoding). Spark's CSV sink handles RFC 4180
    * quoting; unbound (NULL) stays an empty field. */
  private def csvCell(c: Column): Column = {
    val kind = c.getField("kind")
    val lex = c.getField("lex")
    val num = c.getField("num")
    when(c.isNull, functions.lit(null).cast(StringType))
      .when(kind === KNil, NilIri)
      .when(kind === KKeyword, concat(functions.lit(KwBase), lex))
      .when(kind === KUri,
        when(lex.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), lex)
          .otherwise(concat(functions.lit(RelBase), lex)))
      .when(kind === KLong, lex)
      .when(kind === KDouble, num.cast(StringType))
      .when(kind === KBool,
        when(num === 1.0, "true").otherwise("false"))
      .otherwise(lex) // string / lang / typed / date / opaque: lexical
  }

  /** CSV writer (header + RFC 4180 quoting via Spark's CSV sink). */
  def saveCsv(sol: DataFrame, path: String): Unit =
    sol.select(sol.columns.map(n => csvCell(col(n)).as(n)).toSeq: _*)
      .write.mode("overwrite").option("header", "true").csv(path)

  // ------------------------------------------------------------ TSV

  /** TSV writer (SPARQL 1.1 TSV format): header `?x<TAB>?y`, terms as
    * N-Triples-style tokens (grammar-legal TSV terms), one header per
    * part file (the distributed-sink contract). Unbound = empty
    * field; `coalesce` keeps the column count (concat_ws would DROP
    * null cells and shift columns). */
  def saveTsv(sol: DataFrame, path: String): Unit = {
    val spark = sol.sparkSession
    import spark.implicits._
    val header = sol.columns.map("?" + _).mkString("\t")
    // when/otherwise, NOT coalesce: termToken's unknown-kind guard is
    // a raise_error, and coalesce evaluates its first argument on
    // NULL structs (where the kind-dispatch falls through to the
    // guard); a CaseWhen short-circuits
    val line = concat_ws("\t",
      sol.columns.map(n =>
        when(col(n).isNull, functions.lit(""))
          .otherwise(NTriples.termToken(col(n)))).toSeq: _*)
    sol.select(line.as("v")).as[String]
      .mapPartitions(it => Iterator(header) ++ it)
      .write.mode("overwrite").text(path)
  }

  /** The whole result set as ONE TSV document string (the
    * HTTP-response shape, [[boundedRows]]-guarded — the third lossless
    * content-negotiation form beside the JSON and XML documents). */
  def toTsvDoc(sol: DataFrame): String = {
    val header = sol.columns.map("?" + _).mkString("\t")
    val line = concat_ws("\t",
      sol.columns.map(n =>
        when(col(n).isNull, functions.lit(""))
          .otherwise(NTriples.termToken(col(n)))).toSeq: _*)
    (Iterator(header) ++
      boundedRows(sol.select(line.as("v")), "SparqlResults.saveTsv")
        .iterator.map(_.getString(0)))
      .mkString("", "\n", "\n")
  }

  /** One TSV term token → a term (null for an empty cell). */
  private[graft] def tsvTerm(tok: String): Term = {
    if (tok.isEmpty) return null
    if (tok.startsWith("<") && tok.endsWith(">"))
      Turtle.termOfIri(NtExpressions.iriDecode(
        tok.substring(1, tok.length - 1)))
    else if (tok.startsWith("\"")) {
      val close = {
        // the closing quote: first unescaped '"' after position 0
        var j = 1; var found = -1
        while (found < 0 && j < tok.length) {
          if (tok.charAt(j) == '\\') j += 2
          else if (tok.charAt(j) == '"') found = j
          else j += 1
        }
        if (found < 0) throw new IllegalArgumentException(
          s"unterminated TSV literal: $tok")
        found
      }
      val lex = NtExpressions.echarUnescape(tok.substring(1, close))
      val rest = tok.substring(close + 1)
      if (rest.isEmpty) Turtle.termOfLiteral(lex, "", "")
      else if (rest.startsWith("@"))
        Turtle.termOfLiteral(lex, rest.substring(1), "")
      else if (rest.startsWith("^^<") && rest.endsWith(">"))
        Turtle.termOfLiteral(lex, "",
          NtExpressions.iriDecode(rest.substring(3, rest.length - 1)))
      else throw new IllegalArgumentException(
        s"malformed TSV literal suffix: $tok")
    }
    else if (tok == "true") TBool(true)
    else if (tok == "false") TBool(false)
    else if (tok.matches("[+-]?\\d+")) TLong(tok.toLong)
    else if (tok.matches("[+-]?(\\d+\\.\\d*|\\.?\\d+)([eE][+-]?\\d+)?"))
      TDouble(tok.toDouble)
    else if (tok.startsWith("_:")) throw new IllegalArgumentException(
      "blank-node TSV bindings are outside the Term model — skolemize " +
        "upstream")
    else throw new IllegalArgumentException(s"malformed TSV term: $tok")
  }

  /** TSV reader — line-parallel (each line is self-contained; header
    * lines are recognized per part file). Vars come from the header. */
  def loadTsv(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
    val firstLine = lines.limit(1).collect()
    if (firstLine.isEmpty) throw new IllegalArgumentException(
      s"no TSV lines under $path")
    val header = firstLine(0).getString(0)
    if (!header.startsWith("?")) throw new IllegalArgumentException(
      s"TSV header must list ?vars, got: $header")
    val vars = header.split("\t").toSeq.map { h =>
      if (!h.startsWith("?")) throw new IllegalArgumentException(
        s"TSV header cell without '?': $h")
      h.substring(1)
    }
    val schema = StructType(vars.map(v =>
      StructField(v, Term.schema, nullable = true)))
    implicit val enc = Encoders.row(schema)
    lines.flatMap { r =>
      val ln = r.getString(0)
      if (ln == header || ln.isEmpty) Iterator.empty
      else {
        val cells = ln.split("\t", -1)
        if (cells.length != vars.size) throw new IllegalArgumentException(
          s"TSV row arity ${cells.length} != ${vars.size} vars: $ln")
        Iterator.single(Row(cells.toSeq.map { c =>
          val t = tsvTerm(c)
          if (t == null) null else Term.toRow(t)
        }: _*))
      }
    }
  }
}
