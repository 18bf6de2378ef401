package graft

import graft.core.{QuadDb, Term, TripleDb}
import graft.core.Term._
import graft.dsl._
import graft.sparql.{AskQuery, ConstructQuery, DescribeQuery, Parser, Printer, SelectQuery, Sparql, SparqlQuery}

/** The SPARQL 1.1 text front-end (graft/sparql): parse → the existing
  * DSL AST. String-authored queries are pinned AST-IDENTICAL to their
  * hand-built twins — the compiler sees the same nodes, so plans are
  * byte-identical by construction (the q182 equivalence discipline,
  * one level up). Round-trip identity (parse ∘ print) is pinned here
  * on hand-built canonical queries and fuzzed in
  * [[SparqlRoundTripProps]].
  */
class SparqlSpec extends GraftSpec {

  private val gk = "PREFIX gk: <urn:graft:kw/>\n"
  private val ex = "PREFIX ex: <http://data/example/>\n"

  private def parseQ(s: String): SparqlQuery = Parser.parse(s)
  private def sel(s: String): SelectQuery =
    parseQ(s).asInstanceOf[SelectQuery]

  test("string SELECT ≡ DSL twin: BGP + OPTIONAL + FILTER + BIND + " +
      "VALUES + modifiers — AST identity (= plan identity)") {
    val q = sel(ex + gk +
      """SELECT DISTINCT ?p ?n
        |WHERE {
        |  ?p <urn:graft:kw/foaf/knows> ?q .
        |  ?q <urn:graft:kw/rdfs/label> ?n .
        |  OPTIONAL { ?q gk:age ?a . FILTER (?a > 30) }
        |  VALUES ?p { ex:rick ex:katie }
        |  BIND(STRLEN(?n) AS ?len)
        |  FILTER (?len >= 4 && !BOUND(?a))
        |}
        |ORDER BY ?n DESC(?len)
        |LIMIT 5 OFFSET 1""".stripMargin)
    assert(q == SelectQuery(
      proj = Seq(?("p"), ?("n")),
      where = Seq(
        pat(?("p"), T(knows), ?("q")),
        pat(?("q"), T(label), ?("n")),
        Optional(Seq(pat(?("q"), T(k("age")), ?("a")),
          FilterCmp(?("a"), Gt, TLong(30)))),
        Values(?("p"), Seq(rick, katie)),
        Bind(TStrlen(TVar(?("n"))), ?("len")),
        FilterAnd(Seq(FilterCmp(?("len"), Ge, TLong(4)),
          FilterNot(FilterBound(?("a")))))),
      orderBy = Seq((TVar(?("n")), true), (TVar(?("len")), false)),
      limit = 5, offset = 1, distinct = true))
  }

  test("string SELECT runs end-to-end ≡ the DSL query's results") {
    val got = Sparql.select(friends, ex + gk +
      """SELECT ?o WHERE { ex:rick <urn:graft:kw/foaf/knows> ?o }""")
      .collect().map(r => Term.fromRow(r.getStruct(0))).toSet
    assert(got == Set(martin, katie))
  }

  test("paths parse to the canonical nodes: +, alt+, seq, inverse, " +
      "negated sets, star/opt/range; bare predicates stay triples") {
    def where(s: String): Seq[PatternRow] =
      sel(ex + gk + s"SELECT * WHERE { $s }").where
    assert(where("?s gk:p+ ?o .") ==
      Seq(PathPattern(?("s"), PathPlus(k("p")), ?("o"))))
    assert(where("?s (gk:p|gk:q)+ ?o .") ==
      Seq(PathPattern(?("s"), PathAltPlus(Seq(k("p"), k("q"))), ?("o"))))
    assert(where("?s gk:p/^gk:q ?o .") ==
      Seq(PathPattern(?("s"),
        PathSeq(Seq(PathPred(k("p")), PathInv(PathPred(k("q"))))), ?("o"))))
    assert(where("?s !(gk:p|gk:q) ?o .") ==
      Seq(PathPattern(?("s"), PathNeg(Seq(k("p"), k("q"))), ?("o"))))
    assert(where("?s !(^gk:p) ?o .") ==
      Seq(PathPattern(?("s"), PathInv(PathNeg(Seq(k("p")))), ?("o"))))
    assert(where("?s gk:p* ?o .") ==
      Seq(PathPattern(?("s"), PathStar(PathPred(k("p"))), ?("o"))))
    assert(where("?s gk:p? ?o .") ==
      Seq(PathPattern(?("s"), PathOpt(PathPred(k("p"))), ?("o"))))
    assert(where("?s gk:p{2,4} ?o .") ==
      Seq(PathPattern(?("s"), PathRange(PathPred(k("p")), 2, 4), ?("o"))))
    assert(where("?s (gk:p/gk:q)+ ?o .") ==
      Seq(PathPattern(?("s"),
        PathPlusOf(PathSeq(Seq(PathPred(k("p")), PathPred(k("q"))))),
        ?("o"))))
    // a bare predicate path is a PLAIN triple pattern (canonical)
    assert(where("?s gk:p ?o .") ==
      Seq(pat(?("s"), T(k("p")), ?("o"))))
    // 'a' is rdf:type, and object lists / predicate lists expand
    assert(where("?s a ?t ; gk:p ?o , 42 .") == Seq(
      pat(?("s"),
        T(TUri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")), ?("t")),
      pat(?("s"), T(k("p")), ?("o")),
      pat(?("s"), T(k("p")), T(TLong(42)))))
  }

  test("UNION / MINUS / FILTER (NOT) EXISTS / GRAPH / subselect / " +
      "VALUES table parse to the exact engine nodes") {
    def where(s: String): Seq[PatternRow] =
      sel(ex + gk + s"SELECT * WHERE { $s }").where
    assert(where("{ ?s gk:p ?o . } UNION { ?s gk:q ?o . }") ==
      Seq(Union(Seq(Seq(pat(?("s"), T(k("p")), ?("o"))),
        Seq(pat(?("s"), T(k("q")), ?("o")))))))
    assert(where("?s gk:p ?o . MINUS { ?s gk:bad ?o . }") ==
      Seq(pat(?("s"), T(k("p")), ?("o")),
        Minus(Seq(pat(?("s"), T(k("bad")), ?("o"))))))
    assert(where("?s gk:p ?o . FILTER NOT EXISTS { ?s gk:q ?o . }") ==
      Seq(pat(?("s"), T(k("p")), ?("o")),
        NotExists(Seq(pat(?("s"), T(k("q")), ?("o"))))))
    assert(where("?s gk:p ?o . FILTER EXISTS { ?s gk:q ?x . }") ==
      Seq(pat(?("s"), T(k("p")), ?("o")),
        FilterExists(Seq(pat(?("s"), T(k("q")), ?("x"))))))
    // EXISTS composes inside expressions (the FilterExpr leaf)
    assert(where("?s gk:p ?o . FILTER (EXISTS { ?s gk:q ?x . } || " +
      "!EXISTS { ?s gk:r ?x . })") ==
      Seq(pat(?("s"), T(k("p")), ?("o")),
        FilterOr(Seq(FilterExists(Seq(pat(?("s"), T(k("q")), ?("x")))),
          FilterNot(FilterExists(Seq(pat(?("s"), T(k("r")), ?("x")))))))))
    // GRAPH lowers through GraphScope to quad rows
    assert(where("GRAPH ?g { ?s gk:p ?o . }") ==
      Seq(QuadPattern(?("s"), T(k("p")), ?("o"), ?("g"))))
    assert(where("GRAPH ex:g1 { ?s gk:p+ ?o . }") ==
      Seq(QuadPathPattern(?("s"), PathPlus(k("p")), ?("o"), T(u("g1")))))
    // subquery
    assert(where("?n gk:label ?nm . { SELECT ?n (MAX(?b) AS ?mx) " +
      "WHERE { ?c gk:in ?n . ?c gk:bal ?b . } GROUP BY ?n }") ==
      Seq(pat(?("n"), T(k("label")), ?("nm")),
        SubSelect(Seq(?("n"), ?("mx")),
          Seq(pat(?("c"), T(k("in")), ?("n")),
            pat(?("c"), T(k("bal")), ?("b"))),
          groupBy = Seq(?("n")),
          aggs = Seq(Agg(AggMax, Some(?("b")), ?("mx"))))))
    // the multi-var VALUES table with UNDEF
    assert(where("VALUES (?a ?b) { (1 2) (UNDEF \"x\") }") ==
      Seq(ValuesTable(Seq(?("a"), ?("b")),
        Seq(Seq(Some(TLong(1)), Some(TLong(2))),
          Seq(None, Some(TString("x")))))))
  }

  test("aggregate SELECT: GROUP BY vars and expressions, HAVING, " +
      "COUNT(*) / COUNT(DISTINCT) / GROUP_CONCAT separators") {
    val q = sel(gk +
      """SELECT ?seg (COUNT(*) AS ?n) (COUNT(DISTINCT ?nat) AS ?d)
        |  (GROUP_CONCAT(?nm; SEPARATOR=",") AS ?all)
        |WHERE { ?c gk:seg ?seg . ?c gk:nat ?nat . ?c gk:name ?nm . }
        |GROUP BY ?seg
        |HAVING (?n > 10)
        |ORDER BY DESC(?n) LIMIT 3""".stripMargin)
    assert(q == SelectQuery(
      proj = Seq(?("seg"), ?("n"), ?("d"), ?("all")),
      where = Seq(pat(?("c"), T(k("seg")), ?("seg")),
        pat(?("c"), T(k("nat")), ?("nat")),
        pat(?("c"), T(k("name")), ?("nm"))),
      aggs = Seq(Agg(AggCount, None, ?("n")),
        Agg(AggCount, Some(?("nat")), ?("d"), distinct = true),
        Agg(AggGroupConcat(","), Some(?("nm")), ?("all"))),
      groupBy = Seq((TVar(?("seg")), ?("seg"))),
      having = Some(FilterCmp(?("n"), Gt, TLong(10))),
      orderBy = Seq((TVar(?("n")): TermExpr, false)),
      limit = 3))
    // GROUP BY (expr AS ?v) — the q182 sugar, straight from text
    val q2 = sel(gk +
      """SELECT ?y (COUNT(*) AS ?n) WHERE { ?o gk:date ?d . }
        |GROUP BY (YEAR(?d) AS ?y)""".stripMargin)
    assert(q2.groupBy == Seq((TDatePart(TVar(?("d")), DfYear), ?("y"))))
  }

  test("§18.2.4.2 select expressions over aggregate aliases: post-agg " +
      "binds in written order; loud on direct aggregate arithmetic " +
      "and on unassigned refs") {
    val q = sel(gk +
      """SELECT ?seg (MAX(?b) AS ?hi) (MIN(?b) AS ?lo)
        |  ((?hi - ?lo) AS ?spread)
        |WHERE { ?c gk:seg ?seg . ?c gk:bal ?b . } GROUP BY ?seg""".stripMargin)
    assert(q.postBinds ==
      Seq(Bind(NSub(NVar(?("hi")), NVar(?("lo"))), ?("spread"))))
    assert(q.proj == Seq(?("seg"), ?("hi"), ?("lo"), ?("spread")))
    // runs end-to-end over the aggregated frame
    val d = db(
      (k("c1"), k("seg"), s("A")), (k("c1"), k("bal"), l(10)),
      (k("c2"), k("seg"), s("A")), (k("c2"), k("bal"), l(3)),
      (k("c3"), k("seg"), s("B")), (k("c3"), k("bal"), l(7)))
    val got = Sparql.selectDf(d, q).collect().map(r =>
      (Term.fromRow(r.getStruct(0)), Term.fromRow(r.getStruct(3)))).toSet
    assert(got == Set((s("A"), TLong(7)), (s("B"), TLong(0))))
    // direct aggregate arithmetic: loud, with the alias hint
    assert(intercept[InvalidBgp] {
      sel(gk + "SELECT ((MAX(?b) - MIN(?b)) AS ?r) " +
        "WHERE { ?c gk:bal ?b . }")
    }.getMessage.contains("alias"))
    // an expression reading a non-alias var in an aggregate query
    assert(intercept[InvalidBgp] {
      sel(gk + "SELECT (COUNT(*) AS ?n) ((?b * 2) AS ?x) " +
        "WHERE { ?c gk:bal ?b . }")
    }.getMessage.contains("not yet assigned"))
  }

  test("ORDER BY DESC over an aggregate alias parses to the var key") {
    // DESC(?n) where ?n is a var: the parser canon is TVar inside
    // ASC/DESC brackets — assert the engine accepts it
    val q = sel(gk +
      "SELECT ?s WHERE { ?s gk:p ?o . } ORDER BY DESC(?s) ?o")
    assert(q.orderBy == Seq((TVar(?("s")): TermExpr, false),
      (TVar(?("o")): TermExpr, true)))
  }

  test("CONSTRUCT / ASK / DESCRIBE forms; DESCRIBE <iri> sugar; " +
      "projection-expression desugar to Bind") {
    val c = parseQ(ex + gk +
      """CONSTRUCT { ?p gk:met ?q . ?q gk:met ?p . }
        |WHERE { ?p <urn:graft:kw/foaf/knows> ?q . }""".stripMargin)
    assert(c == ConstructQuery(
      Seq((?("p"), T(k("met")), ?("q")), (?("q"), T(k("met")), ?("p"))),
      Seq(pat(?("p"), T(knows), ?("q")))))
    val a = parseQ(ex + gk + "ASK { ex:rick <urn:graft:kw/foaf/knows> ?x . }")
    assert(a == AskQuery(Seq(pat(T(rick), T(knows), ?("x")))))
    val d = parseQ(ex + gk + "DESCRIBE ?p WHERE { ?p <urn:graft:kw/foaf/knows> ?q . }")
    assert(d == DescribeQuery(?("p"), Seq(pat(?("p"), T(knows), ?("q")))))
    // DESCRIBE <iri> ≡ the VALUES-pinned var form
    val d2 = parseQ(ex + "DESCRIBE ex:rick").asInstanceOf[DescribeQuery]
    assert(d2.where == Seq(Values(d2.v, Seq(rick))))
    // SELECT (expr AS ?x) desugars to a trailing Bind (§18.2.4)
    val p = sel(gk +
      "SELECT ?s (STRLEN(?o) AS ?len) WHERE { ?s gk:p ?o . }")
    assert(p.proj == Seq(?("s"), ?("len")))
    assert(p.where == Seq(pat(?("s"), T(k("p")), ?("o")),
      Bind(TStrlen(TVar(?("o"))), ?("len"))))
  }

  test("execution: CONSTRUCT / ASK / DESCRIBE / GRAPH select run") {
    // CONSTRUCT both directions of knows
    val built = Sparql.constructDf(friends, parseQ(ex + gk +
      """CONSTRUCT { ?p gk:met ?q . ?q gk:met ?p . }
        |WHERE { ?p <urn:graft:kw/foaf/knows> ?q . }""".stripMargin)
      .asInstanceOf[ConstructQuery])
    assert(TripleDb(built).triples.toSet.count(_._2 == k("met")) == 6)
    // ASK
    assert(Sparql.ask(friends,
      parseQ(ex + gk + "ASK { ex:rick <urn:graft:kw/foaf/knows> ex:katie . }")
        .asInstanceOf[AskQuery]))
    assert(!Sparql.ask(friends,
      parseQ(ex + gk + "ASK { ex:katie <urn:graft:kw/foaf/knows> ex:rick . }")
        .asInstanceOf[AskQuery]))
    // DESCRIBE: rick's subject-CBD = his 3 facts
    val desc = Sparql.describeDf(friends,
      parseQ(ex + "DESCRIBE ex:rick").asInstanceOf[DescribeQuery])
    assert(TripleDb(desc).triples.toSet ==
      friends.triples.toSet.filter(_._1 == rick))
    // GRAPH over a quad store
    val qdb = QuadDb.fromQuads(spark, Seq(
      (rick, knows, martin, u("g1")), (rick, knows, katie, u("g2"))))
    val got = Sparql.select(qdb, ex + gk +
      "SELECT ?g WHERE { GRAPH ?g { ex:rick <urn:graft:kw/foaf/knows> ex:katie . } }")
      .collect().map(r => Term.fromRow(r.getStruct(0))).toSet
    assert(got == Set(u("g2")))
  }

  test("aggregate SELECT runs end-to-end (GROUP BY + HAVING + ORDER)") {
    val d = db(
      (k("c1"), k("seg"), s("A")), (k("c2"), k("seg"), s("A")),
      (k("c3"), k("seg"), s("A")), (k("c4"), k("seg"), s("B")),
      (k("c5"), k("seg"), s("B")), (k("c6"), k("seg"), s("C")))
    val got = Sparql.select(d, gk +
      """SELECT ?seg (COUNT(*) AS ?n) WHERE { ?c gk:seg ?seg . }
        |GROUP BY ?seg HAVING (?n >= 2) ORDER BY DESC(?n)""".stripMargin)
      .collect().map(r => (Term.fromRow(r.getStruct(0)),
        Term.fromRow(r.getStruct(1)))).toSeq
    assert(got == Seq((s("A"), TLong(3)), (s("B"), TLong(2))))
  }

  test("term literals: language tags, typed literals, doubles, " +
      "booleans, dates, reserved bases") {
    val w = sel(gk +
      """SELECT * WHERE {
        |  ?s gk:p "plain" , "tagged"@en-US , "5"^^<http://dt> ,
        |     2.5 , -7 , true , "2024-02-29T00:00:00"^^
        |     <http://www.w3.org/2001/XMLSchema#dateTime> ,
        |     <urn:graft:nil> , <urn:graft:rel/row/7> .
        |}""".stripMargin).where
    val objs = w.collect { case TriplePattern(_, _, T(t)) => t }
    assert(objs == Seq(TString("plain"), TLangString("tagged", "en-US"),
      TTyped("5", "http://dt"), TDouble(2.5), TLong(-7), TBool(true),
      TDate("2024-02-29T00:00:00"), TNil, TUri("row/7")))
  }

  test("loud position-bearing errors outside the subset") {
    def err(q: String): String =
      intercept[InvalidBgp] { parseQ(q) }.getMessage
    assert(err("BASE <http://x/> SELECT * WHERE { ?s ?p ?o }")
      .contains("BASE"))
    assert(err("SELECT * WHERE { _:b ?p ?o }").contains("blank node"))
    assert(err("SELECT * WHERE { { ?s ?p ?o } }")
      .contains("bare nested group"))
    assert(err("SELECT * WHERE { SERVICE <http://x/> { ?s ?p ?o } }")
      .contains("SERVICE"))
    assert(err("SELECT * WHERE { ?s ?p ?o FILTER (?o) }")
      .contains("boolean"))
    assert(err("SELECT * WHERE { ?s ?p ?o FILTER (STRLEN(?o) + 1 > 2) }")
      .contains("arithmetic"))
    // flags OUTSIDE the portable trio refuse; dup flags refuse
    assert(err("SELECT * WHERE { ?s ?p ?o FILTER regex(?o, \"x\", \"q\") }")
      .contains("flag"))
    assert(err("SELECT * WHERE { ?s ?p ?o FILTER regex(?o, \"x\", \"ix\") }")
      .contains("flag"))
    assert(err("SELECT * WHERE { ?s ?p ?o FILTER regex(?o, \"x\", \"ii\") }")
      .contains("duplicate"))
    assert(err("SELECT * WHERE { ?s ?p ?o FILTER (SHA1(?o) = \"x\") }")
      .contains("SHA1"))
    assert(err("SELECT * WHERE { ?s ?p ?o FILTER (NOW() > ?o) }")
      .contains("non-deterministic"))
    assert(err("SELECT DISTINCT REDUCED ?s WHERE { ?s ?p ?o }")
      .contains("exclusive"))
    // a select expression in an AGGREGATE query may only read
    // already-assigned aliases/keys (§18.2.4.2 scoping)
    assert(err("SELECT (SUM(?o) AS ?t) (STRLEN(?x) AS ?l) " +
      "WHERE { ?s ?p ?o }").contains("not yet assigned"))
    assert(err("SELECT ?s WHERE { ?s ?p ?o } extra")
      .contains("trailing input"))
    assert(err("SELECT * WHERE { ?s gk:p ?o }").contains("undeclared prefix"))
    // errors carry a position
    assert(err("SELECT * WHERE { _:b ?p ?o }").matches(
      "(?s)SPARQL parse error at \\d+:\\d+.*"))
  }

  test("q189-q193 entry strings parse AST-IDENTICAL to their DSL " +
      "twins — the compiler sees the same nodes, so the driver-entry " +
      "plans are byte-identical to hand-built queries") {
    val src = SparkEntry.sparqlEntrySources
    assert(parseQ(src("q189_sparql_select")) == SelectQuery(
      proj = Seq(?("c"), ?("n"), ?("b")),
      where = Seq(
        pat(?("c"), T(k("c_mktsegment")), T(s("BUILDING"))),
        pat(?("c"), T(k("c_name")), ?("n")),
        pat(?("c"), T(k("c_acctbal")), ?("b")),
        FilterCmp(?("b"), Gt, TDouble(9000.0))),
      orderBy = Seq((TVar(?("b")), false), (TVar(?("c")), true)),
      limit = 20))
    assert(parseQ(src("q190_sparql_agg")) == SelectQuery(
      proj = Seq(?("n"), ?("cnt"), ?("lo")),
      where = Seq(
        pat(?("c"), T(k("c_nationkey")), ?("n")),
        pat(?("c"), T(k("c_acctbal")), ?("b"))),
      aggs = Seq(Agg(AggCount, None, ?("cnt")),
        Agg(AggMin, Some(?("b")), ?("lo"))),
      groupBy = Seq((TVar(?("n")), ?("n"))),
      having = Some(FilterCmp(?("cnt"), Gt, TLong(40))),
      orderBy = Seq((TVar(?("cnt")), false), (TVar(?("n")), true)),
      limit = 5))
    assert(parseQ(src("q191_sparql_construct")) == ConstructQuery(
      Seq((?("n"), T(k("in_region")), ?("r")),
        (?("r"), T(k("has_nation")), ?("n"))),
      Seq(pat(?("n"), T(k("n_regionkey")), ?("r")))))
    assert(parseQ(src("q192_sparql_ask")) == AskQuery(Seq(
      pat(?("c"), T(k("c_mktsegment")), T(s("BUILDING"))),
      pat(?("c"), T(k("c_acctbal")), ?("b")),
      FilterCmp(?("b"), Gt, TDouble(9999.0)))))
    val d = parseQ(src("q193_sparql_describe")).asInstanceOf[DescribeQuery]
    assert(d.where == Seq(Values(d.v, Seq(TUri("customer/42")))))
    assert(parseQ(src("q200_sparql_regex_i")) == SelectQuery(
      proj = Seq(?("c"), ?("name"), ?("seg")),
      where = Seq(
        pat(?("c"), T(k("c_name")), ?("name")),
        pat(?("c"), T(k("c_mktsegment")), ?("seg")),
        FilterAnd(Seq(
          FilterRegex(?("seg"), "^bui|^aut", "i"),
          FilterRegex(?("name"), "[13579]$"))))))
  }

  test("REDUCED lowers to a plain SELECT (§18.2.5.2 permits the " +
      "identity — one-way sugar, never printed back)") {
    assert(parseQ("SELECT REDUCED ?s WHERE { ?s ?p ?o }") ==
      parseQ("SELECT ?s WHERE { ?s ?p ?o }"))
  }

  test("text queries run over ALL FOUR store layouts: struct, dict, " +
      "quad, dict-quad — same solutions through each compiler path") {
    val q = sel(ex +
      "SELECT ?o WHERE { ex:rick <urn:graft:kw/foaf/knows> ?o }")
    def got(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => Term.fromRow(r.getStruct(0))).toSet
    assert(got(Sparql.selectDf(friends, q)) == Set(martin, katie))
    assert(got(Sparql.selectDf(friends.dictEncode(), q)) ==
      Set(martin, katie))
    val qdb = QuadDb.fromTripleDb(friends, u("g1"))
    assert(got(Sparql.selectDf(qdb, q)) == Set(martin, katie))
    assert(got(Sparql.selectDf(qdb.dictEncode(), q)) == Set(martin, katie))
    val ask = parseQ(ex +
      "ASK { ex:rick <urn:graft:kw/foaf/knows> ex:katie . }")
      .asInstanceOf[AskQuery]
    assert(Sparql.ask(friends.dictEncode(), ask))
    assert(Sparql.ask(qdb.dictEncode(), ask))
  }

  test("FROM / FROM NAMED (§13.2/§13.3): the default graph is the RDF " +
      "MERGE of FROM graphs, plain patterns read ONLY it, GRAPH ranges " +
      "over NAMED graphs only, and FROM graphs are invisible to GRAPH") {
    val q = sel(ex + gk +
      """SELECT ?s ?o FROM ex:g1 FROM ex:g2 FROM NAMED ex:g3
        |WHERE { ?s gk:p ?o . }""".stripMargin)
    assert(q.dataset == Some(graft.sparql.Dataset(
      Seq(u("g1"), u("g2")), Seq(u("g3")))))
    val store = QuadDb.fromQuads(spark, Seq(
      (k("a"), k("p"), l(1), u("g1")),
      (k("a"), k("p"), l(1), u("g2")), // same triple in both FROM graphs
      (k("b"), k("p"), l(2), u("g2")),
      (k("c"), k("p"), l(3), u("g3")), // named only
      (k("d"), k("p"), l(4), u("g4")), // outside the dataset
      (k("e"), k("p"), l(5), QuadDb.DefaultGraph))) // source default: out
    def run(text: String) = Sparql.select(store, ex + gk + text)
      .collect().map(r => r.toSeq.indices.map(i =>
        if (r.isNullAt(i)) null else Term.fromRow(r.getStruct(i)))).toSeq
    // RDF merge: (a p 1) asserted in g1 AND g2 is ONE solution; g3/g4
    // and the source's own default graph are invisible to plain rows
    assert(bag1(run("""SELECT ?s ?o FROM ex:g1 FROM ex:g2 FROM NAMED ex:g3
      |WHERE { ?s gk:p ?o . }""".stripMargin)) == Map(
      Seq(k("a"), l(1)) -> 1, Seq(k("b"), l(2)) -> 1))
    // GRAPH ?g ranges over the NAMED graphs only — never the
    // constructed default, never a FROM graph
    assert(bag1(run("""SELECT ?g ?s FROM ex:g1 FROM NAMED ex:g3
      |WHERE { GRAPH ?g { ?s gk:p ?o . } }""".stripMargin)) == Map(
      Seq(u("g3"), k("c")) -> 1))
    // ground GRAPH on a FROM graph: merged away → no match
    assert(run("""SELECT ?s FROM ex:g1 FROM NAMED ex:g3
      |WHERE { GRAPH ex:g1 { ?s gk:p ?o . } }""".stripMargin).isEmpty)
    // FROM-only dataset: GRAPH ?g is empty
    assert(run("""SELECT ?g FROM ex:g1
      |WHERE { ?s gk:p ?o . OPTIONAL { GRAPH ?g { ?s gk:p ?o . } } }"""
      .stripMargin).forall(_ == Seq(null)))
    // ASK with a dataset
    assert(!Sparql.ask(store, parseQ(ex + gk +
      "ASK FROM ex:g1 { ?s gk:p 3 . }").asInstanceOf[AskQuery]))
    assert(Sparql.ask(store, parseQ(ex + gk +
      "ASK FROM ex:g2 { ?s gk:p 2 . }").asInstanceOf[AskQuery]))
    // triple stores have no graphs to select from
    assert(intercept[InvalidBgp] {
      Sparql.select(friends, ex + gk +
        "SELECT ?s FROM ex:g1 WHERE { ?s gk:p ?o . }")
    }.getMessage.contains("QUAD store"))
  }

  test("late grammar refinements: elt{n,} quantifier desugars onto the " +
      "fixpoint algebra, trailing VALUES joins the group, HAVING takes " +
      "EXISTS, DISTINCT on non-COUNT aggregates is a positioned error") {
    def where(s: String): Seq[PatternRow] =
      sel(ex + gk + s"SELECT * WHERE { $s }").where
    assert(where("?s gk:p{0,} ?o .") ==
      Seq(PathPattern(?("s"), PathStar(PathPred(k("p"))), ?("o"))))
    assert(where("?s gk:p{1,} ?o .") ==
      Seq(PathPattern(?("s"), PathPlus(k("p")), ?("o"))))
    assert(where("?s gk:p{3,} ?o .") ==
      Seq(PathPattern(?("s"), PathSeq(Seq(PathPred(k("p")),
        PathPred(k("p")), PathPlus(k("p")))), ?("o"))))
    // trailing VALUES (§18.2.5): joins the group before the modifiers
    val tv = sel(ex + gk +
      """SELECT ?o WHERE { ex:rick <urn:graft:kw/foaf/knows> ?o . }
        |ORDER BY ?o LIMIT 5 VALUES ?o { ex:katie }""".stripMargin)
    assert(tv.where.last == Values(?("o"), Seq(katie)))
    val got = Sparql.selectDf(friends, tv)
      .collect().map(r => Term.fromRow(r.getStruct(0))).toSet
    assert(got == Set(katie))
    // HAVING EXISTS through the text grammar (q181's engine shape)
    val he = sel(gk +
      """SELECT ?n (COUNT(*) AS ?c) WHERE { ?x gk:in ?n . }
        |GROUP BY ?n HAVING (?c > 1 && EXISTS { ?s gk:flag ?n . })"""
        .stripMargin)
    assert(he.having == Some(FilterAnd(Seq(
      FilterCmp(?("c"), Gt, TLong(1)),
      FilterExists(Seq(pat(?("s"), T(k("flag")), ?("n"))))))))
    // DISTINCT beyond COUNT: loud at parse, with a position
    val e = intercept[InvalidBgp] {
      sel(gk + "SELECT (SUM(DISTINCT ?b) AS ?t) WHERE { ?c gk:b ?b . }")
    }.getMessage
    assert(e.contains("COUNT only") && e.matches(
      "(?s)SPARQL parse error at \\d+:\\d+.*"))
    // aggregate trailing VALUES stays out of the subset
    assert(intercept[InvalidBgp] {
      sel(gk + "SELECT (COUNT(*) AS ?c) WHERE { ?s gk:p ?o . } " +
        "VALUES ?o { 1 }")
    }.getMessage.contains("AGGREGATE"))
    // CONSTRUCT WHERE shorthand (§16.2.1): the pattern IS the template
    assert(parseQ(ex + gk +
      "CONSTRUCT WHERE { ?p <urn:graft:kw/foaf/knows> ?q . }") ==
      ConstructQuery(Seq((?("p"), T(knows), ?("q"))),
        Seq(pat(?("p"), T(knows), ?("q")))))
    assert(intercept[InvalidBgp] {
      parseQ(ex + gk + "CONSTRUCT WHERE { ?p gk:x ?q . FILTER (?q > 1) }")
    }.getMessage.contains("plain triple"))
  }

  test("runToJson: one call from query string to the standard response " +
      "body for every result form") {
    import graft.sources.SparqlResults
    // SELECT → sparql-results+json
    val sel1 = Sparql.runToJson(friends, ex +
      "SELECT ?o WHERE { ex:rick <urn:graft:kw/foaf/knows> ?o }")
    val (vars, rows) = SparqlResults.parseJsonDoc(sel1)
    assert(vars == Seq("o") &&
      rows.map(_.head).toSet == Set(martin, katie))
    // ASK → the boolean document
    assert(SparqlResults.parseAskJsonDoc(Sparql.runToJson(friends,
      ex + "ASK { ex:rick <urn:graft:kw/foaf/knows> ex:katie . }")))
    // CONSTRUCT → N-Triples body
    val nt = Sparql.runToJson(friends, ex +
      "CONSTRUCT { ?q <urn:graft:kw/known-by> ?p . } WHERE { " +
      "?p <urn:graft:kw/foaf/knows> ?q . }")
    assert(nt.linesIterator.count(_.nonEmpty) == 3)
    assert(nt.contains("<urn:graft:kw/known-by>"))
    // DESCRIBE over a quad store → N-Quads body (graphs kept)
    val qdb = QuadDb.fromTripleDb(friends, u("g1"))
    val nq = Sparql.runToJson(qdb, ex + "DESCRIBE ex:rick")
    assert(nq.linesIterator.count(_.nonEmpty) == 3)
    assert(nq.contains("<http://data/example/g1> ."))
    // CONSTRUCT over a quad store: the protocol edge collapses graphs
    // itself (union-of-graphs view + per-fact dedup) — same body as
    // the triple-store leg
    val ntq = Sparql.runToJson(qdb, ex +
      "CONSTRUCT { ?q <urn:graft:kw/known-by> ?p . } WHERE { " +
      "?p <urn:graft:kw/foaf/knows> ?q . }")
    assert(ntq.linesIterator.count(_.nonEmpty) == 3)
    assert(ntq.contains("<urn:graft:kw/known-by>"))
  }

  test("response-body bound: an oversized single-document result is a " +
      "loud message naming the distributed writer, never a driver OOM") {
    spark.conf.set(graft.sources.SparqlResults.BodyMaxRowsKey, "2")
    try {
      val e = intercept[InvalidBgp] {
        Sparql.runToJson(friends, "SELECT * WHERE { ?s ?p ?o }")
      }
      assert(e.getMessage.contains("saveJson"))
      val e2 = intercept[InvalidBgp] {
        Sparql.runToJson(friends, ex +
          "CONSTRUCT { ?s <urn:graft:kw/x> ?o . } WHERE { ?s ?p ?o }")
      }
      assert(e2.getMessage.contains("NTriples.save"))
      // within the bound still works
      assert(Sparql.runToJson(friends,
        "SELECT * WHERE { ?s ?p ?o } LIMIT 2").contains("bindings"))
    } finally spark.conf.unset(graft.sources.SparqlResults.BodyMaxRowsKey)
  }

  test("printer round-trip: parse(print(q)) == q on all four forms") {
    val queries: Seq[String] = Seq(
      ex + gk +
        """SELECT DISTINCT ?p ?n WHERE {
          |  ?p <urn:graft:kw/foaf/knows> ?q . ?q <urn:graft:kw/rdfs/label> ?n .
          |  OPTIONAL { ?q gk:age ?a . FILTER (?a > 30) }
          |  FILTER (STRSTARTS(?n, "K") || !BOUND(?a))
          |  BIND((?a * 2) AS ?a2)
          |} ORDER BY ?n LIMIT 5""".stripMargin,
      gk + """SELECT ?seg (COUNT(*) AS ?n) WHERE { ?c gk:seg ?seg . }
        |GROUP BY ?seg HAVING (?n > 2) ORDER BY DESC(?n)""".stripMargin,
      ex + gk + "CONSTRUCT { ?p gk:met ?q . } WHERE { ?p <urn:graft:kw/foaf/knows> ?q . }",
      ex + gk + "ASK { ex:rick <urn:graft:kw/foaf/knows> ?x . FILTER NOT EXISTS { " +
        "?x gk:bad ?y . } }",
      ex + "DESCRIBE ?p WHERE { ?p <urn:graft:kw/foaf/knows> ?q . }",
      ex + gk + "SELECT * WHERE { GRAPH ?g { ?s gk:p+ ?o . } " +
        "VALUES (?s ?o) { (ex:rick UNDEF) } }")
    for (src <- queries) {
      val q1 = parseQ(src)
      val printed = Printer.print(q1)
      val q2 = parseQ(printed)
      assert(q2 == q1, s"round-trip drift:\n$printed")
    }
  }
}
