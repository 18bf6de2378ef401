package graft.sources

import graft.core.{Term, TripleDb}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.w3c.dom.{Element, Node}

import scala.collection.mutable

/** RDF/XML interchange (a practical subset of W3C RDF/XML 1.1) — the
  * sixth and last W3C syntax with real installed base: legacy
  * ontologies, DBpedia dumps, and OWL tooling all ship RDF/XML, and a
  * user migrating from an RDF-centric stack will have these files.
  *
  * Supported subset (read):
  *   - an `rdf:RDF` root (or a single node element as the root);
  *   - NODE ELEMENTS: `rdf:Description rdf:about="iri"` and TYPED node
  *     elements (`<ns:Type rdf:about>` → an rdf:type triple);
  *   - PROPERTY ELEMENTS: text content (plain literal), `rdf:resource`
  *     (node reference), `rdf:datatype` (typed literal — xsd numerics
  *     /boolean/dateTime normalize to native kinds, the opaque base to
  *     opaque terms, exactly [[Turtle.termOfLiteral]]), `xml:lang`
  *     (inherited through element scope per XML, producing language
  *     literals), `<rdf:type rdf:resource>` as an ordinary property;
  *   - PROPERTY ATTRIBUTES on node elements (non-rdf/xml attributes →
  *     plain/lang string literals, the schema.org-dump shorthand).
  *
  * Everything else FAILS LOUDLY with the offending element:
  * `rdf:parseType` (Literal/Resource/Collection), `rdf:nodeID` and
  * missing `rdf:about` (blank nodes — skolemize upstream),
  * `rdf:ID`/`xml:base` (relative-IRI resolution), containers
  * (`rdf:li`, `rdf:_N`, Bag/Seq/Alt node elements), reification
  * (`rdf:Statement`), and NESTED node elements inside property
  * elements (not striped-flat — flatten before import). Parse errors
  * are never silent nils. Term mapping is [[NTriples]]'/[[Turtle]]'s
  * reserved-base scheme, pinned by the cross-format spec test.
  *
  * Scale shape: RDF/XML is NOT splittable (namespace declarations and
  * `xml:lang` are document-scoped state, like Turtle's prefixes), so
  * parallelism is per-FILE — one DOM parse task per file, the same
  * contract every production loader has for this format. For multi-TB
  * dumps, convert to (gzipped) N-Triples, which streams line-parallel.
  *
  * The writer emits one self-contained document per partition (its own
  * `rdf:RDF` envelope and namespace declarations; repeated
  * `rdf:Description` elements for one subject are legal RDF/XML, so
  * the sink is a shuffle-free per-row projection like [[Turtle.save]]).
  *
  * Reference semantics: the engine-side term model is
  * /root/reference/src/grafter/matcha/alpha.clj:40-58; this format
  * maps it onto W3C RDF/XML, which the reference does not read.
  */
object RdfXml {

  private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val XmlNs = "http://www.w3.org/XML/1998/namespace"
  private val KwBase = "urn:graft:kw/"
  private val RelBase = "urn:graft:rel/"
  private val NilIri = "urn:graft:nil"
  private val OpaqueBase = "urn:graft:opaque/"
  private val Xsd = "http://www.w3.org/2001/XMLSchema#"

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"RDF/XML parse error: $msg")

  // ---------------------------------------------------------------
  // Reader
  // ---------------------------------------------------------------

  private def domOf(doc: String): Element = {
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    // no DTDs: entity expansion is an attack surface and RDF/XML data
    // dumps don't need it
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl",
      true)
    val dom = try dbf.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(doc.getBytes("UTF-8")))
    catch { case e: Exception => fail(s"malformed XML (${e.getMessage})") }
    dom.getDocumentElement
  }

  private def isRdf(e: Element, local: String): Boolean =
    e.getNamespaceURI == RdfNs && e.getLocalName == local

  private def rdfAttr(e: Element, local: String): Option[String] =
    Option(e.getAttributeNodeNS(RdfNs, local)).map(_.getValue)

  /** The element's effective `xml:lang` (inherits from the parent
    * scope per XML; `xml:lang=""` clears it). */
  private def langOf(e: Element, outer: String): String =
    Option(e.getAttributeNodeNS(XmlNs, "lang"))
      .map(_.getValue).getOrElse(outer)

  private def iriTerm(iri: String): Term = {
    if (!iri.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*"))
      fail(s"'$iri' is not an absolute IRI (rdf:ID / xml:base " +
        "relative-IRI resolution is outside the subset)")
    Turtle.termOfIri(iri)
  }

  private def describe(e: Element): String =
    s"<${Option(e.getPrefix).map(_ + ":").getOrElse("")}${e.getLocalName}>"

  /** Children of `e` that are elements; non-whitespace text between
    * them fails loudly (stray text is always an authoring error in
    * the striped syntax). */
  private def childElems(e: Element): Seq[Element] = {
    val kids = e.getChildNodes
    val out = mutable.ArrayBuffer.empty[Element]
    for (i <- 0 until kids.getLength) kids.item(i) match {
      case el: Element => out += el
      case t: org.w3c.dom.Text =>
        if (t.getData.trim.nonEmpty) fail(
          s"stray text '${t.getData.trim.take(40)}' between elements " +
            s"in ${describe(e)}")
      case _: org.w3c.dom.Comment => ()
      case _ => ()
    }
    out.toSeq
  }

  private def refuseOutside(e: Element): Unit = {
    for (a <- Seq("parseType", "nodeID", "ID"))
      if (rdfAttr(e, a).isDefined) fail(
        s"rdf:$a on ${describe(e)} is outside the subset (" +
          (if (a == "parseType") "parseType Literal/Resource/Collection " +
            "needs a full RDF/XML processor"
          else if (a == "nodeID") "blank nodes — skolemize upstream"
          else "relative-IRI resolution") + ")")
    if (e.getAttributeNodeNS(XmlNs, "base") != null ||
        e.getAttributes != null && Option(e.getAttributeNode("xml:base"))
          .isDefined)
      fail(s"xml:base on ${describe(e)} is outside the subset")
  }

  /** One NODE element → its triples. */
  private def nodeTriples(e: Element,
                          outerLang: String): Seq[(Term, Term, Term)] = {
    refuseOutside(e)
    val lang = langOf(e, outerLang)
    if (e.getNamespaceURI == RdfNs && e.getLocalName != "Description")
      fail(s"rdf:${e.getLocalName} node elements (containers / " +
        "reification) are outside the subset")
    val about = rdfAttr(e, "about").getOrElse(fail(
      s"node element ${describe(e)} has no rdf:about (anonymous nodes " +
        "are outside the Term model — skolemize upstream)"))
    val s = iriTerm(about)
    val out = mutable.ArrayBuffer.empty[(Term, Term, Term)]
    // typed node element → rdf:type triple
    if (!isRdf(e, "Description"))
      out += ((s, Turtle.termOfIri(RdfNs + "type"),
        iriTerm(e.getNamespaceURI + e.getLocalName)))
    // property ATTRIBUTES (non-rdf, non-xmlns, non-xml:lang)
    val attrs = e.getAttributes
    for (i <- 0 until attrs.getLength) {
      val a = attrs.item(i).asInstanceOf[org.w3c.dom.Attr]
      val ns = Option(a.getNamespaceURI).getOrElse("")
      val isXmlns = ns == "http://www.w3.org/2000/xmlns/" ||
        a.getName == "xmlns" || a.getName.startsWith("xmlns:")
      if (!isXmlns && ns != RdfNs && ns != XmlNs) {
        if (ns.isEmpty) fail(s"un-namespaced attribute '${a.getName}' " +
          s"on ${describe(e)} (property attributes need a namespace)")
        val o = if (lang.nonEmpty) Term.TLangString(a.getValue, lang)
          else Term.TString(a.getValue)
        out += ((s, iriTerm(ns + a.getLocalName), o))
      }
    }
    // property ELEMENTS
    for (p <- childElems(e)) {
      refuseOutside(p)
      val pns = Option(p.getNamespaceURI).getOrElse(fail(
        s"un-namespaced property element ${describe(p)}"))
      if (pns == RdfNs &&
          (p.getLocalName == "li" || p.getLocalName.matches("_\\d+")))
        fail(s"rdf:${p.getLocalName} container membership is outside " +
          "the subset")
      val pred = iriTerm(pns + p.getLocalName)
      val plang = langOf(p, lang)
      // a property element holds EITHER literal text OR (refused)
      // nested elements — enumerate children directly; childElems'
      // stray-text rule applies to node-element scope only
      val kids = p.getChildNodes
      val inner = (0 until kids.getLength).map(kids.item)
        .collect { case el: Element => el }
      val o: Term = rdfAttr(p, "resource") match {
        case Some(r) =>
          if (inner.nonEmpty || p.getTextContent.trim.nonEmpty) fail(
            s"property element ${describe(p)} carries BOTH " +
              "rdf:resource and content")
          iriTerm(r)
        case None if inner.nonEmpty => fail(
          s"nested node element inside ${describe(p)} — the subset " +
            "reads the striped-FLAT form (rdf:resource references); " +
            "flatten before import")
        case None =>
          val lex = p.getTextContent
          rdfAttr(p, "datatype") match {
            case Some(dt) => Turtle.termOfLiteral(lex, "", dt)
            case None if plang.nonEmpty => Term.TLangString(lex, plang)
            case None => Term.TString(lex)
          }
      }
      out += ((s, pred, o))
    }
    out.toSeq
  }

  /** One whole RDF/XML document → its triples. */
  private[sources] def parseDoc(doc: String): Seq[(Term, Term, Term)] = {
    val root = domOf(doc)
    if (isRdf(root, "RDF")) {
      refuseOutside(root)
      val lang = langOf(root, "")
      childElems(root).flatMap(nodeTriples(_, lang))
    } else nodeTriples(root, "") // a single node element as the root
  }

  /** Parse whole RDF/XML documents (one per row, the `wholetext`
    * shape) into (s, p, o) rows — one DOM task per file. */
  def parse(files: DataFrame): DataFrame = {
    implicit val enc = Encoders.row(TripleDb.schema)
    files.select(col("value"))
      .flatMap { r =>
        parseDoc(r.getString(0)).iterator.map { case (s, p, o) =>
          Row(Term.toRow(s), Term.toRow(p), Term.toRow(o))
        }
      }.toDF("s", "p", "o")
  }

  /** Load a directory (or glob) of .rdf files into a [[TripleDb]] —
    * one parse task per file (RDF/XML is not splittable; class note). */
  def load(spark: SparkSession, path: String): TripleDb =
    TripleDb(parse(spark.read.option("wholetext", "true").text(path)))

  // ---------------------------------------------------------------
  // Writer
  // ---------------------------------------------------------------

  private def xmlEsc(s: String): String = {
    val b = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '&' => b.append("&amp;")
        case '<' => b.append("&lt;")
        case '>' => b.append("&gt;")
        case '"' => b.append("&quot;")
        case _ =>
          // XML 1.0 cannot represent most C0 controls AT ALL (not even
          // escaped) — fail loudly rather than emit an unparseable doc
          if (c < ' ' && c != '\t' && c != '\n' && c != '\r') fail(
            s"string contains XML-unrepresentable control character " +
              f"U+${c.toInt}%04X — ship this data as N-Triples")
          b.append(c)
      }
      i += 1
    }
    b.toString
  }

  /** IRI body of a node-position term (the [[NTriples]] scheme). */
  private def iriOf(t: Term): String = t match {
    case Term.TNil        => NilIri
    case Term.TKeyword(n) => KwBase + n
    case Term.TUri(u)     =>
      if (u.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*")) u else RelBase + u
    case other => throw new IllegalArgumentException(
      s"cannot serialize $other in a node position")
  }

  /** Split a predicate IRI into (namespace, NCName local) — the
    * standard RDF/XML writer rule: the longest NCName suffix becomes
    * the element local name. An IRI with NO NCName suffix cannot be a
    * property element name; fail loudly (N-Triples carries those). */
  private def splitPred(iri: String): (String, String) = {
    var i = iri.length
    while (i > 0 && isNcNameChar(iri.charAt(i - 1))) i -= 1
    // back off until the local part STARTS legally
    while (i < iri.length && !isNcNameStart(iri.charAt(i))) i += 1
    if (i == iri.length || i == 0) fail(
      s"predicate IRI '$iri' has no NCName suffix to form a property " +
        "element name — serialize this store as N-Triples")
    (iri.substring(0, i), iri.substring(i))
  }
  private def isNcNameStart(c: Char): Boolean =
    Character.isLetter(c) || c == '_'
  private def isNcNameChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_' || c == '-' || c == '.'

  /** A property element for one (p, o) pair, namespaces collected into
    * `ns` (prefix n0, n1, … per distinct namespace, document-local). */
  private def propXml(p: Term, o: Term,
                      ns: mutable.LinkedHashMap[String, String]): String = {
    val (pns, plocal) = splitPred(iriOf(p))
    val pfx = ns.getOrElseUpdate(pns, s"n${ns.size}")
    val tag = s"$pfx:$plocal"
    o match {
      case Term.TString(s) => s"<$tag>${xmlEsc(s)}</$tag>"
      case Term.TLangString(lex, lg) =>
        s"""<$tag xml:lang="${xmlEsc(lg)}">${xmlEsc(lex)}</$tag>"""
      case Term.TLong(v) =>
        s"""<$tag rdf:datatype="${Xsd}long">$v</$tag>"""
      case Term.TDouble(v) =>
        s"""<$tag rdf:datatype="${Xsd}double">$v</$tag>"""
      case Term.TBool(v) =>
        s"""<$tag rdf:datatype="${Xsd}boolean">$v</$tag>"""
      case Term.TDate(iso) =>
        s"""<$tag rdf:datatype="${Xsd}dateTime">${xmlEsc(iso)}</$tag>"""
      case Term.TTyped(lex, dt) =>
        s"""<$tag rdf:datatype="${xmlEsc(dt)}">${xmlEsc(lex)}</$tag>"""
      case Term.TOpaque(t, b64) =>
        s"""<$tag rdf:datatype="${xmlEsc(OpaqueBase + t)}">""" +
          s"${xmlEsc(b64)}</$tag>"
      case ref => s"""<$tag rdf:resource="${xmlEsc(iriOf(ref))}"/>"""
    }
  }

  /** Serialize to RDF/XML: one self-contained document per part file
    * (own rdf:RDF envelope + namespace declarations); one
    * rdf:Description per (s, p, o) row — repeated subjects are legal,
    * so the sink is shuffle-free (the [[Turtle.save]] contract). */
  def save(db: TripleDb, path: String): Unit = {
    val spark = db.df.sparkSession
    import spark.implicits._
    db.df.select("s", "p", "o").map { r =>
      val (s, p, o) = (Term.fromRow(r.getStruct(0)),
        Term.fromRow(r.getStruct(1)), Term.fromRow(r.getStruct(2)))
      val ns = mutable.LinkedHashMap.empty[String, String]
      val prop = propXml(p, o, ns)
      val decls = ns.map { case (uri, pfx) =>
        s"""xmlns:$pfx="${xmlEsc(uri)}"""" }.mkString(" ")
      s"""<rdf:Description rdf:about="${xmlEsc(iriOf(s))}" $decls>""" +
        s"$prop</rdf:Description>"
    }.mapPartitions { it =>
      Iterator("""<?xml version="1.0" encoding="UTF-8"?>""" +
        s"""<rdf:RDF xmlns:rdf="$RdfNs">""") ++ it ++ Iterator("</rdf:RDF>")
    }.write.mode("overwrite").text(path)
  }
}
