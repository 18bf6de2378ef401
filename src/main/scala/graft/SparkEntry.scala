package graft

import graft.core.{Term, TripleDb}
import graft.core.Term._
import graft.dsl._
import graft.engine.Projections
import org.apache.spark.sql.{Column, DataFrame, SparkSession, functions}
import org.apache.spark.sql.functions._

/** Driver contract: one `queries` entry per implemented operator
  * (SURVEY.md §2 + the LLM-pipeline tier), each with DuckDB-equivalent
  * `oracleSql` over the same parquet tables.
  *
  * Encoding discipline (SURVEY §5): query outputs are term-encoded
  * strings (`Term.encode`'s `<tag>|<lex>` scheme) or exact integer /
  * boolean columns, never raw doubles, so the Spark↔DuckDB hash compare
  * is bit-exact. Column names are aliased identically on both sides.
  */
object SparkEntry {

  // --- tiny DSL shorthands ---
  private def kw(s: String) = T(TKeyword(s))
  private def u(s: String) = T(TUri(s))
  private def strT(x: String) = T(TString(x))
  private def pat(a: TermOrVar, b: TermOrVar, c: TermOrVar) = TriplePattern(a, b, c)

  private def enc(name: String): Column = Term.encode(col(name)).as(name)

  /** selectDf + encode every projected var to its canonical string. */
  private def sel(db: TripleDb, rows: Seq[PatternRow], vars: String*): DataFrame =
    Projections.selectDf(db, rows, vars.map(V(_))).select(vars.map(enc): _*)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_bgp_select")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- 1-2: triple-pattern scan + BGP conjunction (join fold) ----
    "q01_bgp_select" -> ((sp, dir) => {
      val db = Tables.graph(sp, dir)
      sel(db, Seq(
        pat(V("c"), kw("c_nationkey"), V("n")),
        pat(V("n"), kw("n_name"), V("nname")),
        pat(V("c"), kw("c_name"), V("cname"))),
        "cname", "nname")
    }),

    // ---- 3: values on a pattern-bound var (IN-filter) ----
    "q02_values_in" -> ((sp, dir) => {
      val db = Tables.customerDb(sp, dir)
      sel(db, Seq(
        pat(V("c"), kw("c_mktsegment"), V("seg")),
        Values(V("seg"), Seq(TString("BUILDING"), TString("MACHINERY")))),
        "c", "seg")
    }),

    // ---- 3b: values on an unbound var (generator cross join) ----
    "q03_values_gen" -> ((sp, dir) => {
      val db = Tables.regionDb(sp, dir)
      sel(db, Seq(
        pat(V("r"), kw("r_name"), V("rn")),
        Values(V("tag"), Seq(TString("x"), TString("y")))),
        "rn", "tag")
    }),

    // ---- 3c: values bag semantics — duplicate elements multiply ----
    "q04_values_dup_bag" -> ((sp, dir) => {
      val db = Tables.regionDb(sp, dir)
      sel(db, Seq(
        pat(V("r"), kw("r_name"), V("rn")),
        Values(V("rn"), Seq(TString("AFRICA"), TString("AFRICA"), TString("AMERICA")))),
        "r", "rn")
    }),

    // ---- 4: optional (left join; unbound → NULL ≙ reified _N) ----
    "q05_optional" -> ((sp, dir) => {
      val db = TripleDb.union(Tables.customerDb(sp, dir), Tables.ordersDb(sp, dir))
      sel(db, Seq(
        pat(V("c"), kw("c_name"), V("name")),
        Optional(Seq(
          pat(V("o"), kw("o_custkey"), V("c")),
          pat(V("o"), kw("o_totalprice"), V("price"))))),
        "c", "name", "price")
    }),

    // ---- 4b: same-var optional alternatives → coalesce ----
    "q06_optional_coalesce" -> ((sp, dir) => {
      val db = TripleDb.union(Tables.nationDb(sp, dir),
        Tables.customerDb(sp, dir), Tables.supplierDb(sp, dir))
      sel(db, Seq(
        pat(V("n"), kw("n_name"), V("nname")),
        Optional(Seq(
          pat(V("c"), kw("c_nationkey"), V("n")),
          pat(V("c"), kw("c_name"), V("anyname")))),
        Optional(Seq(
          pat(V("sx"), kw("s_nationkey"), V("n")),
          pat(V("sx"), kw("s_name"), V("anyname"))))),
        "nname", "anyname")
    }),

    // ---- 12: ask (true and false cases) ----
    "q07_ask" -> ((sp, dir) => {
      val db = Tables.customerDb(sp, dir)
      val yes = Projections.ask(db, Seq(pat(V("c"), kw("c_mktsegment"), strT("BUILDING"))))
      val no = Projections.ask(db, Seq(pat(V("c"), kw("c_mktsegment"), strT("NO_SUCH_SEGMENT"))))
      import sp.implicits._
      Seq(("yes", yes), ("no", no)).toDF("which", "ok")
    }),

    // ---- 6: select-1 (deterministic: the BGP has exactly one solution) ----
    "q08_select1" -> ((sp, dir) => {
      val db = Tables.customerDb(sp, dir)
      sel(db, Seq(pat(u("customer/1"), kw("c_name"), V("name"))), "name")
        .limit(1)
    }),

    // ---- 7-8: construct with magic-key subject grouping (distributed) ----
    "q09_construct_group" -> ((sp, dir) => {
      val db = TripleDb.union(Tables.nationDb(sp, dir), Tables.customerDb(sp, dir))
      val sol = Projections.selectDf(db, Seq(
        pat(V("c"), kw("c_nationkey"), V("n")),
        pat(V("c"), kw("c_name"), V("cname")),
        pat(V("n"), kw("n_name"), V("nname"))),
        Seq(V("n"), V("nname"), V("cname")))
      // ≙ construct {:grafter.rdf/uri ?n, :name ?nname, :members ?cname}
      // grouping (alpha.clj:497-512): scalar when 1 distinct, set when ≥2;
      // sets are emitted canonically sorted + '~'-joined for the oracle.
      sol.groupBy(Term.encode(col("n")).as("n"))
        .agg(
          min(Term.encode(col("nname"))).as("nname"),
          array_join(array_sort(collect_set(Term.encode(col("cname")))), "~").as("members"))
    }),

    // ---- 10: build — subject-grouped resource maps (distributed) ----
    "q10_build" -> ((sp, dir) => {
      val db = TripleDb.union(Tables.customerDb(sp, dir), Tables.ordersDb(sp, dir))
      val grouped = Projections.buildDf(db, V("c"),
        Seq("names" -> V("name"), "bals" -> V("bal"), "ords" -> V("o")),
        Seq(
          pat(V("c"), kw("c_name"), V("name")),
          pat(V("c"), kw("c_acctbal"), V("bal")),
          Optional(Seq(pat(V("o"), kw("o_custkey"), V("c"))))))
      def joined(c: String): Column =
        array_join(array_sort(transform(col(c), Term.encode(_))), "~")
      // singleton flatten ≙ alpha.clj:555-569; unbound key dropped → NULL
      grouped.select(
        Term.encode(col("c")).as("c"),
        joined("names").as("name"),
        joined("bals").as("bal"),
        when(size(col("ords")) === 0, functions.lit(null).cast("string"))
          .otherwise(joined("ords")).as("ords"))
    }),

    // ---- 14: merge-dbs set semantics (db ∪ db ≡ db) ----
    "q11_merge_dedup" -> ((sp, dir) => {
      val one = Tables.customerDb(sp, dir)
      val db = TripleDb.merge(one, Tables.customerDb(sp, dir))
      sel(db, Seq(pat(V("c"), kw("c_name"), V("name"))), "c", "name")
    }),

    // ---- 13: index-triples idempotence (dedup + persist) ----
    "q12_index_idempotent" -> ((sp, dir) => {
      val one = Tables.customerDb(sp, dir)
      val db = TripleDb.union(one, Tables.customerDb(sp, dir)).index()
      val n = db.df.agg(count(functions.lit(1)).as("cnt"))
      db.unpersist()
      n
    }),

    // ---- long precision: int64 terms exact past 2^53 ----
    "q13_long_precision" -> ((sp, _) => {
      val db = TripleDb.fromTerms(sp, Seq(
        (TKeyword("x"), TKeyword("val"), TLong(9007199254740993L)),
        (TKeyword("y"), TKeyword("val"), TLong(9007199254740992L))))
      // if longs round-tripped through double these two values collide
      // and the self-join would emit 4 rows, not 2
      sel(db, Seq(
        pat(V("a"), kw("val"), V("v")),
        pat(V("b"), kw("val"), V("v"))),
        "a", "b", "v")
    }),

    // ---- nil is a matchable term value (alpha_test.clj:133-138) ----
    "q14_nil_term" -> ((sp, _) => {
      val db = TripleDb.fromTerms(sp, Seq(
        (TNil, TKeyword("label"), TString("nil label")),
        (TKeyword("a"), TKeyword("label"), TString("a"))))
      sel(db, Seq(pat(V("s2"), kw("label"), V("l"))), "s2", "l")
    }),

    // ---- 5: select bag semantics — no DISTINCT on solutions ----
    "q15_select_bag" -> ((sp, dir) => {
      val db = Tables.customerDb(sp, dir)
      sel(db, Seq(pat(V("c"), kw("c_mktsegment"), V("seg"))), "seg")
    }),

    // ---- date terms + FK hop ----
    "q16_dates" -> ((sp, dir) => {
      val db = Tables.ordersDb(sp, dir)
      sel(db, Seq(
        pat(V("o"), kw("o_orderdate"), V("d")),
        pat(V("o"), kw("o_custkey"), V("c"))),
        "o", "d", "c")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_bgp_select" ->
      """SELECT 's|' || c_name AS cname, 's|' || n_name AS nname
        |FROM customer JOIN nation ON c_nationkey = n_nationkey""".stripMargin,

    "q02_values_in" ->
      """SELECT 'u|customer/' || c_custkey AS c, 's|' || c_mktsegment AS seg
        |FROM customer WHERE c_mktsegment IN ('BUILDING','MACHINERY')""".stripMargin,

    "q03_values_gen" ->
      """SELECT 's|' || r_name AS rn, 's|' || tag AS tag
        |FROM region CROSS JOIN (VALUES ('x'),('y')) t(tag)""".stripMargin,

    "q04_values_dup_bag" ->
      """SELECT 'u|region/' || r_regionkey AS r, 's|' || r_name AS rn
        |FROM region JOIN (VALUES ('AFRICA'),('AFRICA'),('AMERICA')) t(nm)
        |  ON r_name = nm""".stripMargin,

    "q05_optional" ->
      """SELECT 'u|customer/' || c_custkey AS c, 's|' || c_name AS name,
        |  CASE WHEN o_orderkey IS NULL THEN NULL
        |       ELSE 'd|' || printf('%.2f', o_totalprice) END AS price
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey""".stripMargin,

    "q06_optional_coalesce" ->
      """SELECT 's|' || n_name AS nname,
        |  coalesce('s|' || c_name, 's|' || s_name) AS anyname
        |FROM nation
        |LEFT JOIN customer ON c_nationkey = n_nationkey
        |LEFT JOIN supplier ON s_nationkey = n_nationkey""".stripMargin,

    "q07_ask" ->
      """SELECT 'yes' AS which,
        |  EXISTS(SELECT 1 FROM customer WHERE c_mktsegment='BUILDING') AS ok
        |UNION ALL SELECT 'no',
        |  EXISTS(SELECT 1 FROM customer WHERE c_mktsegment='NO_SUCH_SEGMENT')""".stripMargin,

    "q08_select1" ->
      "SELECT 's|' || c_name AS name FROM customer WHERE c_custkey = 1",

    "q09_construct_group" ->
      """SELECT n, nname, string_agg(m, '~' ORDER BY m) AS members FROM (
        |  SELECT DISTINCT 'u|nation/' || n_nationkey AS n,
        |    's|' || n_name AS nname, 's|' || c_name AS m
        |  FROM nation JOIN customer ON c_nationkey = n_nationkey
        |) GROUP BY n, nname""".stripMargin,

    "q10_build" ->
      """SELECT 'u|customer/' || c_custkey AS c, 's|' || c_name AS name,
        |  'd|' || printf('%.2f', c_acctbal) AS bal,
        |  (SELECT string_agg(x, '~' ORDER BY x) FROM (
        |     SELECT DISTINCT 'u|orders/' || o_orderkey AS x
        |     FROM orders WHERE o_custkey = c_custkey) t) AS ords
        |FROM customer""".stripMargin,

    "q11_merge_dedup" ->
      """SELECT 'u|customer/' || c_custkey AS c, 's|' || c_name AS name
        |FROM customer""".stripMargin,

    "q12_index_idempotent" ->
      "SELECT CAST(4 * count(*) AS BIGINT) AS cnt FROM customer",

    "q13_long_precision" ->
      """SELECT 'k|x' AS a, 'k|x' AS b, 'l|9007199254740993' AS v
        |UNION ALL SELECT 'k|y', 'k|y', 'l|9007199254740992'""".stripMargin,

    "q14_nil_term" ->
      """SELECT 'n|' AS s2, 's|nil label' AS l
        |UNION ALL SELECT 'k|a', 's|a'""".stripMargin,

    "q15_select_bag" ->
      "SELECT 's|' || c_mktsegment AS seg FROM customer",

    "q16_dates" ->
      """SELECT 'u|orders/' || o_orderkey AS o,
        |  't|' || strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS d,
        |  'u|customer/' || o_custkey AS c
        |FROM orders""".stripMargin,
  )
}
