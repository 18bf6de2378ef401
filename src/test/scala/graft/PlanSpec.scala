package graft

import graft.dsl._
import graft.engine.Projections
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, length}

/** Plan-shape assertions: the physical properties the engine's scale
  * story depends on, locked as tests so regressions show up as
  * failures, not as silently slower benches.
  */
class PlanSpec extends GraftSpec {

  val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("date-accessor FILTER folds to a scan-side predicate (no join, " +
      "no shuffle); the GROUP-BY-expression sugar keeps ONE hash " +
      "aggregate; ORDER-BY-expression + LIMIT keeps TakeOrdered") {
    val db = Tables.ordersDb(spark, dir)
    // YEAR(?d) = const as a group filter: slice scan + codegen'd
    // predicate, nothing else
    val f = plan(Projections.selectDf(db, Seq(
      pat(V("o"), T(k("o_orderdate")), V("d")),
      FilterArith(TDatePart(TVar(V("d")), DfYear), Eq,
        NConst(graft.core.Term.TLong(1995)))), Seq(V("o"), V("d"))))
    assert(!f.contains("Join"), s"date filter must not join:\n$f")
    assert(!f.contains("Exchange"), s"date filter must not shuffle:\n$f")
    // the q182 shape: implicit pre-Binds keep the plan the plain
    // hash-agg (one partial/final pair = one exchange) + TakeOrdered
    val sol = Projections.selectDf(db, Seq(
      pat(V("o"), T(k("o_orderdate")), V("d"))), Seq(V("d")))
    val agg = Projections.aggregatedExpr(sol,
      Seq((TDatePart(TVar(V("d")), DfYear), V("y"))),
      Seq(Agg(AggCount, None, V("n"))))
    val p = plan(Projections.modifiedExpr(agg,
      Seq((NMul(NVar(V("n")), NConst(graft.core.Term.TLong(-1))), true),
        (TVar(V("y")), true)), limit = 3))
    assert(p.contains("TakeOrderedAndProject"),
      s"expression ORDER BY + LIMIT must stay TakeOrdered:\n$p")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected the one aggregate shuffle, got " +
      s"$exchanges in:\n$p")
    assert("HashAggregate".r.findAllIn(p).size == 2,
      s"expected one partial/final aggregate pair:\n$p")
  }

  test("HAVING-EXISTS marker: the aggregated frame is never shuffled " +
      "for the probe — post-agg joins stay broadcast (the frame is " +
      "group-count-sized), and the aggregate itself is one pair") {
    val db = Tables.graph(spark, dir)
    val sol = Projections.selectDf(db, Seq(
      pat(V("c"), T(k("c_nationkey")), V("n"))), Seq(V("c"), V("n")))
    val agg = Projections.aggregated(sol, Seq(V("n")),
      Seq(Agg(AggCount, None, V("cnt"))))
    val p = plan(Projections.having(db, agg,
      FilterExists(Seq(pat(V("s"), T(k("s_nationkey")), V("n")))),
      preAggVars = Seq(V("c"), V("n"))))
    assert(!p.contains("SortMergeJoin"),
      s"the post-agg marker probe must not sort-merge the frame:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    // compat probes broadcast (distinct shared tuples, bounded by the
    // inner store's key set)
    assert(p.contains("BroadcastExchange"), s"probe must broadcast:\n$p")
  }

  test("UNION: additive concatenation — slice scans union WITHOUT a " +
      "dedup aggregate or shuffle, and an always-bound shared var " +
      "joins the enclosing group by plain (broadcast) hash join") {
    val db = Tables.graph(spark, dir)
    val pUnion = plan(Projections.selectDf(db, Seq(Union(Seq(
      Seq(pat(V("p"), T(k("c_nationkey")), V("n"))),
      Seq(pat(V("p"), T(k("s_nationkey")), V("n"))))))
      , Seq(V("p"), V("n"))))
    assert(pUnion.contains("Union"), s"expected a Union node:\n$pUnion")
    assert(!pUnion.contains("Exchange"),
      s"a bare UNION must not shuffle (no dedup — multiset semantics):\n$pUnion")
    assert(!pUnion.contains("HashAggregate"),
      s"a bare UNION must not deduplicate:\n$pUnion")
    val pJoin = plan(Projections.selectDf(db, Seq(
      Union(Seq(
        Seq(pat(V("p"), T(k("c_nationkey")), V("n"))),
        Seq(pat(V("p"), T(k("s_nationkey")), V("n"))))),
      pat(V("n"), T(k("n_name")), V("nm"))), Seq(V("p"), V("nm"))))
    assert(pJoin.contains("BroadcastHashJoin"),
      s"always-bound shared var must take the equality hash join:\n$pJoin")
    assert(!pJoin.contains("CartesianProduct") &&
      !pJoin.contains("BroadcastNestedLoopJoin"),
      s"no non-equi fallback on an always-bound key:\n$pJoin")
  }

  test("ground-predicate pattern scan uses the predicate slice — no explode") {
    val db = Tables.customerDb(spark, dir)
    val p = plan(Projections.selectDf(db,
      Seq(pat(V("c"), T(k("c_name")), V("n"))), Seq(V("c"), V("n"))))
    assert(!p.contains("Generate"), s"expected no explode in:\n$p")
  }

  test("variable-predicate pattern falls back to the full (exploded) view") {
    val db = Tables.customerDb(spark, dir)
    val p = plan(Projections.selectDf(db,
      Seq(pat(V("c"), V("pred"), V("o"))), Seq(V("c"), V("pred"), V("o"))))
    assert(p.contains("Generate"), "full view requires the unpivot explode")
  }

  test("3-pattern BGP over the star graph: no explode, broadcast joins") {
    val db = Tables.graph(spark, dir)
    val p = plan(Projections.selectDf(db, Seq(
      pat(V("c"), T(k("c_nationkey")), V("n")),
      pat(V("n"), T(k("n_name")), V("nn")),
      pat(V("c"), T(k("c_name")), V("cn"))), Seq(V("cn"), V("nn"))))
    assert(!p.contains("Generate"))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("stats-aware ordering: smaller predicate slice wins boundness ties") {
    import graft.engine.BgpCompiler
    // two patterns, both 1-ground-predicate, no shared vars at pick time:
    // the boundness heuristic ties and falls back to written order — the
    // wrong call when the first pattern scans the big fact slice
    val bigFirst = Seq(
      pat(V("c"), T(k("c_name")), V("n")),   // customer slice (big)
      pat(V("x"), T(k("n_name")), V("m")))   // nation slice (small)
    assert(BgpCompiler.orderPatterns(bigFirst) == bigFirst,
      "without stats the heuristic keeps written order on ties")
    val stats = Map("c_name" -> 1000000L, "n_name" -> 10L)
    assert(BgpCompiler.orderPatterns(bigFirst, stats) == bigFirst.reverse,
      "with stats the small slice scans first")
    // the star graph db carries real parquet-metadata stats, and they
    // order q01's nation pattern ahead of the customer patterns
    val g = Tables.graph(spark, dir)
    assert(g.stats.nonEmpty && g.stats("n_name") < g.stats("c_name"))
    val q01 = Seq(
      pat(V("c"), T(k("c_nationkey")), V("n")),
      pat(V("n"), T(k("n_name")), V("nn")),
      pat(V("c"), T(k("c_name")), V("cn")))
    assert(BgpCompiler.orderPatterns(q01, g.stats).head == q01(1),
      "n_name (25-row nation) should seed the join fold")
  }

  test("values coll past the broadcast limit joins without a broadcast hint") {
    val db = Tables.regionDb(spark, dir)
    val coll = (0 until 70).map(i => graft.core.Term.TString("v" + i))
    def analyzed(): String = {
      val df = Projections.selectDf(db, Seq(
        pat(V("r"), T(k("r_name")), V("n")),
        Values(V("n"), coll)), Seq(V("n")))
      df.queryExecution.analyzed.toString
    }
    // default limit (1M): explicit broadcast hint on the coll side
    assert(analyzed().contains("ResolvedHint"))
    spark.conf.set("graft.values.broadcastLimit", "10")
    try assert(!analyzed().contains("ResolvedHint"),
      "past the limit the values join must not pin a broadcast")
    finally spark.conf.unset("graft.values.broadcastLimit")
  }

  test("buildDf aggregates with exactly one shuffle (map-side combine)") {
    val db = Tables.customerDb(spark, dir)
    val p = plan(Projections.buildDf(db, V("c"),
      Seq("names" -> V("name")), Seq(pat(V("c"), T(k("c_name")), V("name")))))
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges in:\n$p")
  }

  test("constructDf groups with exactly one shuffle (map-side combine)") {
    val db = Tables.customerDb(spark, dir)
    val p = plan(Projections.constructDf(db, V("c"),
      Seq("names" -> V("name")), Seq(pat(V("c"), T(k("c_name")), V("name")))))
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges in:\n$p")
  }

  test("bruteKnn broadcasts the query side, never shuffles the corpus") {
    val emb = Tables.t(spark, dir, "embeddings")
    val p = plan(ops.Similarity.bruteKnn(emb, emb.where(col("vec_id") < 5), 3))
    assert(p.contains("BroadcastExchange"))
  }

  test("hdrSketch: one map-side-combined shuffle carrying only buckets") {
    val docs = Tables.t(spark, dir, "documents")
    val sk = graft.ops.Sketch.hdrSketch(
      docs.select(graft.ops.Text.tokenCount(col("text")).as("v")), "v")
    val p = plan(sk)
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(p).length
    assert(exchanges == 1, s"sketch build must shuffle exactly once:\n$p")
    assert(p.contains("partial_count"), s"combine must be map-side:\n$p")
  }

  test("ground-graph scoped path hop: graph filter is scan-side, the " +
      "only join is the broadcast 1-row source frame") {
    val qdb = Tables.customerQuads(spark, dir)
    val p = plan(Projections.selectDf(qdb, Seq(
      QuadPathPattern(T(graft.core.Term.TUri("customer/1")),
        PathSeq(Seq(PathPred(k("c_nationkey")))),
        V("n"), T(graft.core.Term.TUri("nation/1")))),
      Seq(V("n"))))
    // Catalyst constant-folds the 1-row source frame into scan-side
    // filters (both ground endpoints land in the FileScan's
    // DataFilters), leaving at most a 1-row broadcast gate — assert
    // nothing shuffles and the filters reached the scan
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"scoped hop must not shuffle-join:\n$p")
    assert(p.contains("= [2,nation/1,null,null,null]") &&
      p.contains("= [2,customer/1,null,null,null]"),
      s"graph scope + ground source must land as scan-side filters:\n$p")
    assert(!p.contains("Generate"), s"slice scan, not the unpivot:\n$p")
  }

  test("variable-graph scoped path hop: composite (graph, node) keys, " +
      "no join at all for a single hop") {
    val qdb = Tables.customerQuads(spark, dir)
    val p = plan(Projections.selectDf(qdb, Seq(
      QuadPathPattern(V("c"), PathSeq(Seq(PathPred(k("c_nationkey")))),
        V("n"), V("g"))),
      Seq(V("c"), V("n"), V("g"))))
    assert(!p.contains("Join"),
      s"single scoped hop is a scan + dedup, never a join:\n$p")
  }

  test("FILTER on a slice scan folds to a raw-column predicate pushed " +
      "into the parquet scan") {
    val db = Tables.customerDb(spark, dir)
    val p = plan(Projections.selectDf(db, Seq(
      pat(V("c"), T(k("c_acctbal")), V("b")),
      FilterCmp(V("b"), Gt, graft.core.Term.TDouble(5000.0))), Seq(V("c"), V("b"))))
    // SimplifyExtractValueOps folds getField(named_struct(...)) back to
    // the RAW column: the predicate lands scan-side (DataFilters,
    // inside whole-stage codegen) as `c_acctbal > 5000.0` under the
    // null-guard CASE — one scan, no join, no shuffle. (The CASE
    // wrapper keeps it out of parquet row-group PushedFilters; the
    // row-level evaluation is already at the scan.)
    assert(p.contains("> 5000.0") && p.contains("DataFilters: [CASE WHEN"),
      s"filter must fold to a raw-column scan-side predicate:\n$p")
    assert(!p.contains("Join"), s"struct-store filter must not join:\n$p")
    assert(!p.contains("Exchange"), s"filter must not shuffle:\n$p")
  }

  test("dict var-var FILTER rehydrates DISTINCT id pairs, not solution " +
      "rows: dict joins feed from an aggregate, result re-enters via " +
      "left_semi (the 100 TB shape — dict work bounded by distinct pairs)") {
    val db = Tables.customerDb(spark, dir)
    val dd = db.dictEncode()
    try {
      val df = Projections.selectDf(dd, Seq(
        pat(V("c"), T(k("c_acctbal")), V("a")),
        pat(V("d"), T(k("c_acctbal")), V("b")),
        FilterVarCmp(V("a"), Gt, V("b"))), Seq(V("c"), V("d")))
      df.collect() // finalize the adaptive plan on THIS frame
      val p = plan(df)
      assert(p.contains("LeftSemi"),
        s"qualifying pairs must re-enter via a semi join:\n$p")
      assert(p.contains("HashAggregate"),
        s"dict rehydration must read the DISTINCT pair set:\n$p")
    } finally dd.unpersist()
  }

  test("ORDER BY + LIMIT compiles to TakeOrderedAndProject — " +
      "per-partition top-k, never a global sort") {
    val db = Tables.customerDb(spark, dir)
    val p = plan(Projections.modified(
      Projections.selectDf(db, Seq(
        pat(V("c"), T(k("c_acctbal")), V("b"))), Seq(V("c"), V("b"))),
      Seq(OrderKey(V("b"), asc = false)), limit = 10))
    assert(p.contains("TakeOrderedAndProject"),
      s"k-bounded order must TakeOrdered:\n$p")
    assert(!p.contains("Sort "), s"no global sort for top-k:\n$p")
  }

  test("multi-var VALUES: the literal table BROADCASTS into the " +
      "compatibility join — the solution side never shuffles for it") {
    val db = Tables.customerDb(spark, dir)
    val df = Projections.selectDf(db, Seq(
      pat(V("c"), T(k("c_mktsegment")), V("seg")),
      pat(V("c"), T(k("c_nationkey")), V("n")),
      ValuesTable(Seq(V("seg"), V("n")), Seq(
        Seq(Some(graft.core.Term.TString("BUILDING")), None),
        Seq(Some(graft.core.Term.TString("MACHINERY")),
          Some(graft.core.Term.TUri("nation/3")))))),
      Seq(V("c"), V("seg"), V("n")))
    df.collect()
    val p = plan(df)
    // the UNDEF-guarded condition is non-equi, so the tiny literal
    // side rides a broadcast nested-loop join
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"table join must broadcast the literal side:\n$p")
  }

  test("aggregated: ONE hash-aggregate pair with map-side partial " +
      "aggregation — a single group-key exchange, no join, no window") {
    val db = Tables.customerDb(spark, dir)
    val df = Projections.aggregated(
      Projections.selectDf(db, Seq(
        pat(V("c"), T(k("c_mktsegment")), V("seg"))), Seq(V("seg"))),
      Seq(V("seg")), Seq(Agg(AggCount, None, V("n"))))
    df.collect()
    val p = plan(df)
    assert(p.contains("HashAggregate"), s"hash agg expected:\n$p")
    // partial_count marks the map-side combine (pre-shuffle)
    assert(p.contains("partial_count"), s"map-side partial expected:\n$p")
    assert(!p.contains("Join"), s"aggregation must not join:\n$p")
    assert(!p.contains("Window"), s"aggregation must not window:\n$p")
    assert(p.sliding("Exchange".length).count(_ == "Exchange") <= 2,
      s"one group-key exchange (plus AQE read) at most:\n$p")
  }

  test("BPE encodeTokens: pure scan projection — no shuffle, no join") {
    val docs = Tables.t(spark, dir, "documents")
    val m = Seq(graft.ops.Bpe.Merge(0, "e", "s"),
      graft.ops.Bpe.Merge(1, "es", "t"))
    val p = plan(docs.select(col("doc_id"),
      graft.ops.Bpe.encodeTokens(col("text"), m).as("toks")))
    assert(!p.contains("Exchange"), s"encode must never shuffle:\n$p")
    assert(!p.contains("Join"), s"encode must not join:\n$p")
  }

  test("urlFilter: literal-blocklist projection — no shuffle, no join, " +
    "inside whole-stage codegen") {
    val docs = Tables.t(spark, dir, "documents")
    val p = plan(graft.ops.Text.urlFilter(docs, "doc_id", "text",
      Seq("spam.example", "bad.example")))
    assert(!p.contains("Exchange"), s"corpus must never shuffle:\n$p")
    assert(!p.contains("Join"), s"blocklist must not become a join:\n$p")
    // "*(1)" is the WholeStageCodegen stage marker in compact rendering
    assert(p.contains("*(1) Filter"), s"filter must codegen:\n$p")
  }

  test("codegen'd dot product stays inside whole-stage codegen") {
    val emb = Tables.t(spark, dir, "embeddings")
    val df = emb.as("a").crossJoin(emb.as("b").limit(5))
      .select(ops.Similarity.dot(col("a.embedding"), col("b.embedding")).as("d"))
    df.collect() // finalize THIS df's adaptive plan (count() plans separately)
    val p = plan(df)
    // the `*(n)` prefix on an operator marks its WholeStageCodegen stage
    assert(p.contains("*(") && p.contains("*(2) Project [dotproductf"),
      s"dot must not break codegen:\n$p")
  }

  test("subject-bucketed store joins without a shuffle (co-located join)") {
    import graft.core.TripleDb
    import org.apache.spark.sql.functions.lit
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      TripleDb.saveBucketedBySubject(
        Tables.customerDb(spark, dir), "graft_bucketed_test", buckets = 4)
      val t = spark.table("graft_bucketed_test")
      val names = t.where(col("p.lex") === "c_name")
        .select(col("sk"), col("o").as("name"))
      val segs = t.where(col("p.lex") === "c_mktsegment")
        .select(col("sk"), col("o").as("seg"))
      val j = names.join(segs, "sk")
      j.collect()
      val p = plan(j)
      assert(!p.contains("Exchange"),
        s"bucketed self-join must not shuffle:\n$p")
      assert(p.contains("Bucketed: true"), s"expected bucketed scans:\n$p")
      assert(j.count() == Tables.t(spark, dir, "customer").count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_test")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }
  }

  test("Spark-behavior pin (round 15): a repartition(key)+persist side " +
    "keeps its clustering through a join (no re-exchange) where a " +
    "localCheckpoint degrades to UnknownPartitioning — recorded because " +
    "the iterative loops A/B'd this shape and measured it NET-NEGATIVE " +
    "at sf0.1 (cache decode + setup shuffle > the saved exchange); the " +
    "loops deliberately keep their checkpoint barriers") {
    import org.apache.spark.sql.functions.lit
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // the Paths.closureEdges `e` shape: clustered by the join key,
      // then PERSISTED (a cached plan preserves its outputPartitioning;
      // a localCheckpoint degrades to UnknownPartitioning — measured,
      // which is why the loops persist their static side)
      val e = spark.range(1000)
        .select((col("id") % 100).as("src"), col("id").as("dst"))
        .repartition(col("src"))
        .select(col("src").as("src"), col("dst").as("dst"))
        .persist()
      try {
        val frontier = spark.range(100)
          .select(col("id").as("src"), (col("id") * 2).as("dst"))
          .localCheckpoint()
        val j = frontier.as("f").join(e.as("e"), col("f.dst") === col("e.src"))
        j.collect()
        // the EXECUTED (AQE-final) section only — the trailing
        // "== Initial Plan ==" echo repeats pre-AQE exchanges
        val p = plan(j).split("== Initial Plan ==").head
        // the cache's one-time REPARTITION_BY_COL build shuffle sits
        // INSIDE the InMemoryRelation (executed once); the join itself
        // must add exactly one requirement exchange — the frontier's
        assert(p.linesIterator.count(_.contains("ENSURE_REQUIREMENTS")) == 1,
          s"expected ONE requirement exchange (frontier only — the " +
            s"persisted edge side must keep its clustering):\n$p")
      } finally e.unpersist()
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("saltedJoin spreads a hot key and matches the unsalted join") {
    import org.apache.spark.sql.functions.{lit, when}
    val facts = spark.range(2000).select(
      when(col("id") < 1800, 7L).otherwise(col("id") % 50).as("k"),
      col("id").as("payload"))
    val dim = spark.range(50).select(col("id").as("k"), (col("id") * 3).as("v"))
    val plainRes = facts.join(dim, "k").select("k", "payload", "v")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = ops.Skew.saltedJoin(facts, dim, "k", salts = 8)
      .select("k", "payload", "v")
    assert(salted.collect().map(_.toSeq).sortBy(_.toString).toSeq ==
      plainRes.toSeq)
    // the join key really is (k, salt): hot-key rows hash-spread
    val p = plan(salted)
    assert(p.contains("__salt"), s"expected salted join keys in:\n$p")
  }

  test("AQE splits a skewed join partition (hot-key skew guard)") {
    // the reference-world analogue is an rdf:type-style hot predicate
    // (SURVEY §4.2): one join key holding ~99% of the fact side. At
    // cluster scale the guard is AQE's skew-join split — pin here that
    // our sessions actually get the split (skew=true on the join node)
    // once the skewed partition crosses the threshold.
    import org.apache.spark.sql.functions.{length, lit, md5, sum}
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val saved = keys.map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // hot key 0 carries 150k incompressible-ish payload rows; 1000
      // cold keys carry one row each
      val facts = spark.range(150000)
        .select(lit(0L).as("key"), md5(col("id").cast("string")).as("payload"))
        .union(spark.range(1000).select((col("id") + 1).as("key"),
          md5(col("id").cast("string")).as("payload")))
      val dim = spark.range(1001).select(col("id").as("key"), (col("id") * 2).as("v"))
      val q = facts.join(dim, "key").agg(sum(length(col("payload"))).as("n"))
      q.collect()
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"expected AQE skew split in:\n$p")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("pack assignments plan: one shuffle, one sort, streaming window") {
    val toks = Tables.t(spark, dir, "documents").select(col("doc_id"),
      length(col("text")).cast("long").as("n_tokens"))
    val p = plan(ops.Sample.packAssignments(toks, "doc_id", "n_tokens",
      256L, 4))
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(p).length
    val sorts = "\\bSort\\b".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges in:\n$p")
    assert(sorts == 1, s"expected 1 sort (per-shard), got $sorts in:\n$p")
    assert(!p.contains("SinglePartition"), s"must never globally sort:\n$p")
  }

  test("boilerplate blocklist broadcasts; corpus side anti-joins unshuffled") {
    val p = plan(ops.Text.stripBoilerplate(
      Tables.t(spark, dir, "documents"), "doc_id", "text"))
    assert("BroadcastHashJoin .*LeftAnti".r.findFirstIn(p).isDefined,
      s"blocklist must broadcast into an anti-join:\n$p")
  }

  test("vocab encode: vocabulary ranks via TakeOrdered, joins broadcast") {
    val p = plan(ops.Text.vocabEncode(
      Tables.t(spark, dir, "documents"), "doc_id", "text", 30))
    assert(p.contains("TakeOrderedAndProject"),
      s"vocab LIMIT must be per-partition top-N + merge, not global sort:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"token->id join must broadcast the vocab:\n$p")
  }

  test("searchTopK: token filter precedes shuffles; top-k via TakeOrdered") {
    val p = plan(ops.Text.searchTopK(
      Tables.t(spark, dir, "documents"), "doc_id", "text", "vector join", 5))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must be per-partition + merge, not a global sort:\n$p")
    assert("Filter.*token".r.findFirstIn(p).isDefined ||
      p.contains("isin") || p.contains("IN ("),
      s"query-token filter must prune before aggregation:\n$p")
  }

  test("temperature mixture: thresholds broadcast, corpus never shuffles") {
    val docs = Tables.t(spark, dir, "documents")
    val p = plan(ops.Sample.temperatureMixture(docs, "source", "doc_id", 100L))
    assert(p.contains("BroadcastHashJoin"),
      s"threshold table must broadcast:\n$p")
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(p).length
    assert(exchanges == 0,
      s"the keep filter must not shuffle the corpus, got $exchanges:\n$p")
  }

  test("inverted index: stopword blocklist broadcasts into an anti-join " +
    "below the postings aggregation") {
    val p = plan(ops.Text.invertedIndex(
      Tables.t(spark, dir, "documents"), "doc_id", "text", maxDf = 390))
    assert("BroadcastHashJoin .*LeftAnti".r.findFirstIn(p).isDefined,
      s"high-df tokens must be dropped via broadcast anti-join:\n$p")
  }

  test("compactLatest: one shuffle + streaming row_number, no global sort") {
    val ev = Tables.events(spark, dir)
    val p = plan(ops.AsOf.compactLatest(ev, Seq("user_id"), "ts", "event_id"))
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 shuffle by key, got $exchanges:\n$p")
    assert(!p.contains("SinglePartition"), s"must never globally sort:\n$p")
  }

  test("pageRank round: rank-side joins shuffle only ranks — the " +
    "persisted edges relation is reused, and contribution sums combine " +
    "map-side") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    val r = ops.Rank.pageRank(edges, 1)
    val p = plan(r)
    // partial_sum before the final exchange = map-side combine of contribs
    assert(p.contains("partial_sum") || p.contains("HashAggregate"),
      s"contribution sum must combine map-side:\n$p")
    assert("InMemoryTableScan".r.findAllIn(p).nonEmpty,
      s"edges+outdeg must come from the persisted relation:\n$p")
  }

  test("repeatedSpans: first-occurrence rule is a combinable aggregate, " +
    "not a corpus-wide window partitioned by hash") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f"), (2L, "x a b c d y"))
      .toDF("doc_id", "text")
    val p = plan(ops.Dedup.repeatedSpans(docs, "doc_id", "text", k = 4))
    // a Window partitioned by the window-hash column serializes the
    // hottest span (a license header in 10^8 docs) into ONE task, and
    // AQE cannot split window partitions. The only window allowed is
    // the per-doc run-grouping one (partition key = id, bounded by doc
    // length). The keeper rule must be a partial-aggregable min.
    val windowOnH = p.linesIterator.exists(l =>
      l.contains("Window") && l.contains("[h#"))
    assert(!windowOnH, s"keeper rule must not window-partition by h:\n$p")
    assert(p.contains("partial_min") || p.contains("partial_first") ||
      "HashAggregate.*min".r.findAllIn(p).nonEmpty,
      s"expected a map-side-combinable min over h:\n$p")
  }

  test("rdfs materialize: ONE instance scan, broadcast-joined emissions, " +
    "no instance-side shuffle before the set-semantics dedup") {
    import graft.core.{Term, TripleDb}
    import graft.core.Term._
    import graft.ops.Rdfs
    val db = Tables.nationDb(spark, dir)
    val ont = TripleDb.fromTerms(spark, Seq(
      (TKeyword("n_regionkey"), Rdfs.SubPropertyOf, TKeyword("in_geo")),
      (TKeyword("in_geo"), Rdfs.Domain, TKeyword("place"))))
    val p = plan(Rdfs.materialize(db, ont).df)
    // schema attaches via broadcast — a sort-merge or shuffled-hash
    // join here would shuffle the 100 TB instance store by predicate
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct"), s"instance store must not shuffle:\n$p")
    // the instance parquet is scanned exactly once (the old shape
    // re-ran the scan once per rule family — 8 scans at worst)
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 instance scan, found $scans:\n$p")
    // one KEYED shuffle total — the set-semantics dedup — and its key
    // list must carry the NARROW (p, packed s∥o) form, never three
    // full term structs (round 16). A round-robin exchange below it is
    // the conditional fanOut (a no-op once the scan has ≥ core-count
    // partitions; this fixture is one task without it).
    val keyed = p.linesIterator.count(l => l.contains("Exchange hashpartitioning"))
    assert(keyed == 1, s"expected only the dedup shuffle, found $keyed:\n$p")
    val extra = p.linesIterator.count(l => l.contains("Exchange") &&
      !l.contains("BroadcastExchange") && !l.contains("ReusedExchange") &&
      !l.contains("hashpartitioning") && !l.contains("RoundRobin"))
    assert(extra == 0, s"unexpected non-fanOut exchange:\n$p")
    assert(p.contains("__so"), s"dedup exchange must carry the packed key:\n$p")
  }

  test("quad store: ground-graph scope is a scan filter (no join, no " +
      "shuffle); ground-predicate quad scans hit slices (no explode)") {
    import graft.core.Term
    val qdb = Tables.customerQuads(spark, dir)
    // single ground-graph pattern: pure filtered projection of one slice
    val p1 = plan(Projections.selectDf(qdb, Seq(
      QuadPattern(V("c"), T(k("c_name")), V("n"), T(Term.TUri("nation/3")))),
      Seq(V("c"), V("n"))))
    assert(!p1.contains("Join"), s"graph scope must not join:\n$p1")
    assert(!p1.contains("Exchange"), s"graph scope must not shuffle:\n$p1")
    assert(!p1.contains("Generate"), s"ground-pred quad scan uses slices:\n$p1")
    // two patterns sharing subject+graph vars: slices + broadcast join,
    // still no unpivot explode
    val p2 = plan(Projections.selectDf(qdb, Seq(
      QuadPattern(V("c"), T(k("c_name")), V("n"), V("g")),
      QuadPattern(V("c"), T(k("c_mktsegment")), V("s"), V("g"))),
      Seq(V("c"), V("n"), V("s"), V("g"))))
    assert(!p2.contains("Generate"), s"expected slice scans:\n$p2")
    assert(p2.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p2")
  }

  test("round-12 fast paths stay plan-identical: a nullable-free " +
      "optional keeps the name-equality left join; UNDEF keys switch " +
      "to the compat form") {
    val db = Tables.graph(spark, dir)
    // no UNDEF anywhere: the optional fold must NOT rename keys into
    // the __k_ compat form (that path exists only for provably
    // nullable keys)
    val fast = plan(Projections.selectDf(db, Seq(
      pat(V("c"), T(k("c_name")), V("n")),
      Optional(Seq(pat(V("c"), T(k("c_mktsegment")), V("s"))))),
      Seq(V("c"), V("n"), V("s"))))
    assert(!fast.contains("__k_"),
      s"nullable-free optional took the compat path:\n$fast")
    // an UNDEF-introduced key var flips exactly that optional to the
    // compatibility join (coalesce-merged key)
    val compat = plan(Projections.selectDf(db, Seq(
      ValuesTable(Seq(V("c")), Seq(
        Seq(Some(graft.core.Term.TUri("customer/1"))), Seq(None))),
      Optional(Seq(pat(V("c"), T(k("c_mktsegment")), V("s"))))),
      Seq(V("c"), V("s"))))
    assert(compat.contains("coalesce"),
      s"UNDEF-keyed optional must coalesce-merge the key:\n$compat")
  }

  test("EXISTS marker: equality correlation = one distinct probe + " +
      "left_outer, no nested-loop join; bag preserved by construction") {
    val db = Tables.graph(spark, dir)
    val p = plan(Projections.selectDf(db, Seq(
      pat(V("c"), T(k("c_name")), V("n")),
      FilterExists(Seq(pat(V("o"), T(k("o_custkey")), V("c"))))),
      Seq(V("c"), V("n"))))
    // the probe dedups (HashAggregate) and joins by hash — never a
    // BroadcastNestedLoopJoin for the equality-correlated case
    assert(p.contains("HashAggregate"), s"expected distinct probe:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"equality correlation must hash-join:\n$p")
  }

  test("subquery: one partial/final aggregate pair inside (map-side " +
      "partials), enclosing equi join, no cartesian") {
    val db = Tables.supplierDb(spark, dir)
    val p = plan(Projections.selectDf(db, Seq(
      pat(V("s"), T(k("s_nationkey")), V("nk")),
      SubSelect(Seq(V("nk"), V("mx")), Seq(
        pat(V("s2"), T(k("s_nationkey")), V("nk")),
        pat(V("s2"), T(k("s_acctbal")), V("b2"))),
        groupBy = Seq(V("nk")),
        aggs = Seq(Agg(AggMax, Some(V("b2")), V("mx"))))),
      Seq(V("s"), V("nk"), V("mx"))))
    // max_by over the struct sort key plans as SortAggregate — the
    // property that matters is the PARTIAL/final pair (map-side
    // combine before the one exchange), not the hash/sort flavor
    assert(p.contains("partial_max_by"),
      s"expected a map-side partial aggregate:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("Join"), s"the projected key joins the fold:\n$p")
  }

  test("FROM dataset merge (round 14): graph-membership filters sit on " +
      "the SCANS below ONE dedup pair — the RDF-merge shuffle moves " +
      "only the SELECTED graphs' rows, never the store; a plain " +
      "pattern over the dataset stays a pruned single-exchange plan") {
    import graft.core.Term.TUri
    import graft.sparql.{Dataset, SelectQuery, Sparql}
    val db = Tables.customerQuads(spark, dir)
    val d = Dataset(Seq(TUri("nation/1"), TUri("nation/2")),
      Seq(TUri("nation/3")))
    val p = plan(Sparql.datasetOf(db, d).df)
    assert("HashAggregate".r.findAllIn(p).size == 2,
      s"expected the one partial/final dedup pair:\n$p")
    assert("Exchange".r.findAllIn(p).size == 1,
      s"the merge dedup is the ONLY shuffle:\n$p")
    assert(p.contains("Filter"),
      s"graph membership must filter the scans:\n$p")
    // through the front-end: a ground-predicate pattern over the
    // dataset hits the transformed SLICE (no unpivot union), keeps the
    // single dedup exchange, and joins nothing
    val q = SelectQuery(proj = Seq(V("c"), V("seg")),
      where = Seq(pat(V("c"), T(k("c_mktsegment")), V("seg"))),
      dataset = Some(d))
    val qp = plan(Sparql.selectDf(db, q))
    assert(!qp.contains("Join"), s"single-pattern dataset query must " +
      s"not join:\n$qp")
    assert("Exchange".r.findAllIn(qp).size == 1,
      s"only the merge-dedup shuffle:\n$qp")
  }
  test("trained-LID scoring is ONE zero-shuffle scan projection: " +
      "per-class scores ride a single expression, weights are plan " +
      "literals — no join, no exchange, no aggregate") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta"), (2L, "gamma delta"))
      .toDF("doc_id", "text")
    val w = Array.fill(2)(new Array[Long](64))
    val p = plan(graft.ops.Text.langIdTrained(docs, "text", w,
      Seq("en", "de")))
    assert(!p.contains("Join"), s"scoring must not join:\n$p")
    // fanOut's round-robin repartition is the ONLY exchange allowed —
    // never a hash shuffle (that would mean a join/agg crept in)
    assert(!p.contains("Exchange hashpartitioning"),
      s"scoring must not hash-shuffle:\n$p")
    assert(!p.contains("HashAggregate"), s"scoring must not aggregate:\n$p")
  }
}
