package graft

import graft.core.{QuadDb, Term}
import graft.core.Term._
import graft.sources.SparqlResults

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.http.HttpRequest.BodyPublishers
import java.net.http.HttpResponse.BodyHandlers

/** The SPARQL protocol endpoint (tools/Endpoint.scala): query via
  * GET/POST with content negotiation across the three lossless result
  * formats, update via POST, loud protocol errors. */
class EndpointSpec extends GraftSpec {

  private val http = HttpClient.newHttpClient()

  private def get(base: String, path: String,
                  accept: String = ""): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(base + path)).GET()
    val req = (if (accept.nonEmpty) b.header("Accept", accept) else b).build()
    http.send(req, BodyHandlers.ofString())
  }

  private def post(base: String, path: String, body: String, ctype: String,
                   accept: String = ""): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(base + path))
      .POST(BodyPublishers.ofString(body))
      .header("Content-Type", ctype)
    val req = (if (accept.nonEmpty) b.header("Accept", accept) else b).build()
    http.send(req, BodyHandlers.ofString())
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  test("endpoint: GET/POST query with json/xml/tsv negotiation, ASK " +
      "and CONSTRUCT forms, POST update visible to the next query, " +
      "loud 400s") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_endpoint").toString + "/store"
    QuadDb.save(QuadDb.fromQuads(spark, Seq(
      (k("rick"), k("knows"), k("martin"), QuadDb.DefaultGraph),
      (k("rick"), k("knows"), k("katie"), QuadDb.DefaultGraph),
      (k("katie"), k("age"), l(29), u("g1")))), tmp)
    val server = graft.tools.Endpoint.start(spark, tmp, 0)
    try {
      val base = s"http://localhost:${server.getAddress.getPort}"
      val sel = "PREFIX gk: <urn:graft:kw/> " +
        "SELECT ?o WHERE { gk:rick gk:knows ?o }"
      // GET + default json
      val rj = get(base, s"/sparql?query=${enc(sel)}")
      assert(rj.statusCode() == 200 &&
        rj.headers().firstValue("Content-Type").get()
          .startsWith("application/sparql-results+json"))
      val (vars, rows) = SparqlResults.parseJsonDoc(rj.body())
      assert(vars == Seq("o") &&
        rows.map(_.head).toSet == Set[Term](k("martin"), k("katie")))
      // POST raw sparql-query + xml
      val rx = post(base, "/sparql", sel, "application/sparql-query",
        accept = "application/sparql-results+xml")
      assert(rx.statusCode() == 200 && rx.body().contains("<sparql") &&
        rx.body().contains("urn:graft:kw/martin"))
      // POST form-encoded + tsv
      val rt = post(base, "/sparql", s"query=${enc(sel)}",
        "application/x-www-form-urlencoded",
        accept = "text/tab-separated-values")
      assert(rt.statusCode() == 200 &&
        rt.body().linesIterator.next() == "?o" &&
        rt.body().contains("<urn:graft:kw/katie>"))
      // ASK boolean document
      val ra = get(base, "/sparql?query=" + enc(
        "PREFIX gk: <urn:graft:kw/> ASK { gk:rick gk:knows gk:katie . }"))
      assert(SparqlResults.parseAskJsonDoc(ra.body()))
      // CONSTRUCT → n-triples body
      val rc = get(base, "/sparql?query=" + enc(
        "PREFIX gk: <urn:graft:kw/> CONSTRUCT { ?o gk:known_by gk:rick . }" +
          " WHERE { gk:rick gk:knows ?o }"))
      assert(rc.headers().firstValue("Content-Type").get()
        .startsWith("application/n-triples"))
      assert(rc.body().linesIterator.count(_.nonEmpty) == 2)
      // update lands durably; the next query sees it
      val ru = post(base, "/update",
        "PREFIX gk: <urn:graft:kw/> INSERT DATA { gk:rick gk:knows gk:cat }",
        "application/sparql-update")
      assert(ru.statusCode() == 200, ru.body())
      val rj2 = get(base, s"/sparql?query=${enc(sel)}")
      assert(SparqlResults.parseJsonDoc(rj2.body())._2.size == 3)
      // protocol errors are loud 400s
      assert(get(base, "/sparql").statusCode() == 400)
      assert(get(base, "/sparql?query=" + enc("SELECT nonsense"))
        .statusCode() == 400)
      assert(get(base, "/update").statusCode() == 400)
    } finally server.stop(0)
  }
}
