package graft

import graft.core.{Term, TripleDb}
import graft.core.Term._
import graft.dsl._
import graft.engine.Projections
import graft.streaming.TripleIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming triple ingest + quad interop. */
class StreamingIngestSpec extends GraftSpec {

  test("quads index like triples, dropping the graph element (T:244-245)") {
    val d = TripleDb.fromQuads(spark, Seq(
      (k("s"), k("p"), k("o"), k("g1")),
      (k("s"), k("p2"), k("o2"), k("g2"))))
    val r = resultSet(d, Seq(?("p9"), ?("o9")),
      Seq(pat(T(k("s")), ?("p9"), ?("o9"))))
    assert(r == Set(Seq(k("p"), k("o")), Seq(k("p2"), k("o2"))))
  }

  test("save/load round-trips a store with predicate-partition pruning") {
    val dir = java.nio.file.Files.createTempDirectory("triplestore").toString
    val src = TripleDb.fromWideTable(
      Tables.t(spark, "/root/testdata/sf0.001", "customer"), "customer", "c_custkey",
      fks = Map("c_nationkey" -> "nation"))
    TripleDb.save(src, dir)
    val loaded = TripleDb.load(spark, dir)
    // same facts
    assert(loaded.df.count() == src.df.count())
    assert(loaded.predIndex.keySet == src.predIndex.keySet)
    // ground-predicate scan routes through a pruned slice and matches
    val viaLoaded = resultSet(loaded, Seq(?("c"), ?("name")),
      Seq(pat(?("c"), T(k("c_name")), ?("name"))))
    val viaSrc = resultSet(src, Seq(?("c"), ?("name")),
      Seq(pat(?("c"), T(k("c_name")), ?("name"))))
    assert(viaLoaded == viaSrc && viaLoaded.nonEmpty)
    // the slice's physical plan prunes to one partition directory
    val plan = loaded.predIndex("c_name").queryExecution.executedPlan.toString
    assert(plan.contains("pred=c_name") || plan.toLowerCase.contains("partitionfilters"))
  }

  test("store delete: tombstone-masked ≡ compacted ≡ never-containing; " +
    "untouched predicate partitions byte-stable") {
    val dir = java.nio.file.Files.createTempDirectory("triplestore_del").toString
    val cust = Tables.t(spark, "/root/testdata/sf0.001", "customer")
    val src = TripleDb.fromWideTable(cust, "customer", "c_custkey",
      fks = Map("c_nationkey" -> "nation"))
    TripleDb.save(src, dir)

    def bgp(db: TripleDb) = resultSet(db, Seq(?("c"), ?("name")),
      Seq(pat(?("c"), T(k("c_name")), ?("name"))))
    val before = bgp(TripleDb.load(spark, dir))

    // fingerprint every file of an untouched predicate partition
    def partFiles(pred: String): Map[String, Long] = {
      val d = new java.io.File(s"$dir/pred=$pred")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    // delete every fact about 1-in-5 customers (tombstone write only)
    val gone = cust.where(col("c_custkey") % 5 === 0)
      .select(Term.uriCol(concat(org.apache.spark.sql.functions.lit("customer/"),
        col("c_custkey").cast("string"))).as("s"))
    TripleDb.deleteSubjects(spark, dir, gone)

    val masked = bgp(TripleDb.load(spark, dir))
    assert(masked != before && masked.nonEmpty)
    val expected = before.filterNot(_.head match {
      case TUri(u) => u.stripPrefix("customer/").toLong % 5 == 0
      case _ => false
    })
    assert(masked == expected, "masked load ≡ store never containing them")

    TripleDb.compact(spark, dir)
    assert(bgp(TripleDb.load(spark, dir)) == expected,
      "compacted ≡ tombstone-masked")
    assert(!graft.core.Tombstones.exist(spark, dir), "tombstones cleared")
    // c_acctbal facts of deleted subjects were tombstoned too, so that
    // partition IS affected — check an untouched one instead: __other
    // never exists here; re-check stability on a partition with no
    // deleted rows by deleting nothing and compacting again
    TripleDb.compact(spark, dir) // no tombstones → no-op
    assert(partFiles("c_acctbal").keySet.nonEmpty)

    // now a predicate-scoped delete: only pred=c_name files may change
    val stableBefore = partFiles("c_acctbal")
    val doomed = cust.where(col("c_custkey") % 7 === 3)
      .select(Term.uriCol(concat(org.apache.spark.sql.functions.lit("customer/"),
        col("c_custkey").cast("string"))).as("s"),
        Term.lit(k("c_name")).as("p"),
        Term.fromRaw(col("c_name"),
          org.apache.spark.sql.types.StringType).as("o"))
    TripleDb.deleteTriples(doomed, dir)
    TripleDb.compact(spark, dir)
    assert(partFiles("c_acctbal") == stableBefore,
      "untouched predicate partition byte-stable through compaction")
    val afterScoped = bgp(TripleDb.load(spark, dir))
    val expected2 = expected.filterNot(_.head match {
      case TUri(u) => u.stripPrefix("customer/").toLong % 7 == 3
      case _ => false
    })
    assert(afterScoped == expected2)
  }

  test("streaming unpivot == batch unpivot on the same wide rows") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val wide = Seq((1L, "alice", 10), (2L, "bob", 20))
    val batch = TripleDb.fromWideTable(
      wide.toDF("id", "name", "age"), "user", "id").df
      .select(Term.encode(col("s")), Term.encode(col("p")), Term.encode(col("o")))
      .collect().map(_.toSeq).toSet

    val stream = MemoryStream[(Long, String, Int)]
    stream.addData(wide)
    val out = TripleIngest.unpivot(
      stream.toDF().toDF("id", "name", "age"), "user", "id")
    val sq = out.writeStream.format("memory").queryName("triples_test")
      .outputMode("append").start()
    sq.processAllAvailable()
    sq.stop()
    val streamed = spark.table("triples_test")
      .select(Term.encode(col("s")), Term.encode(col("p")), Term.encode(col("o")))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("streaming ingest dedups duplicate facts within the watermark") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:10")
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    // same fact twice (same key+value, different arrival) + one distinct
    stream.addData(Seq((1L, "alice", t0), (1L, "alice", t1), (2L, "bob", t1)))
    val out = TripleIngest.ingestDedup(
      stream.toDF().toDF("id", "name", "ts"), "user", "id",
      eventTimeCol = "ts", watermark = "1 minute")
    val sq = out.writeStream.format("memory").queryName("ingest_test")
      .outputMode("append").start()
    sq.processAllAvailable()
    sq.stop()
    val rows = spark.table("ingest_test").collect()
    // 2 subjects × 1 non-key column = 2 distinct facts (duplicate dropped)
    assert(rows.length == 2)
  }

  test("late-data accounting: watermark-dropped rows are counted, " +
    "observed input metrics reconcile — loss is never silent") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val listener = new graft.streaming.LateData.Listener
    spark.streams.addListener(listener)
    try {
      val stream = MemoryStream[(String, Double, java.sql.Timestamp)]
      val in = stream.toDF().toDF("event_type", "value", "ts")
      val sq = graft.streaming.Events.hourlyCountsStream(in)
        .writeStream.format("memory").queryName("late_test")
        .outputMode("append").start()
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      // batch 1: on-time events; max event time 12:00 → the NEXT batch
      // runs with watermark 10:00 (2h delay)
      stream.addData(Seq(("click", 1.0, t("2024-01-01 09:00:00")),
                         ("click", 1.0, t("2024-01-01 12:00:00"))))
      sq.processAllAvailable()
      // batch 2: one event 4h older than the watermark (dropped) + one
      // on-time
      stream.addData(Seq(("click", 1.0, t("2024-01-01 06:00:00")),
                         ("click", 1.0, t("2024-01-01 12:30:00"))))
      sq.processAllAvailable()
      sq.stop()
      // the late row is gone from results (the watermark contract)...
      val hours = spark.table("late_test").collect()
        .map(_.getString(0)).toSet
      assert(!hours.contains("2024-01-01 06:00:00"),
        s"late event must not appear in results: $hours")
      // ...but NOT silently: both accounting surfaces report it
      assert(graft.streaming.LateData.droppedByWatermark(sq) == 1,
        "exactly the 06:00 event was dropped as late")
      assert(graft.streaming.LateData.observedInputRows(
        sq, "graft_input_events") == 4, "every fed row was observed")
      // listener delivery is async — poll briefly for the same totals
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while ((listener.dropped(sq) != 1 ||
              listener.inputRows(sq, "graft_input_events") != 4) &&
             System.nanoTime() < deadline) Thread.sleep(50)
      assert(listener.dropped(sq) == 1, "accumulating listener: drops")
      assert(listener.inputRows(sq, "graft_input_events") == 4,
        "accumulating listener: observed inputs")
    } finally spark.streams.removeListener(listener)
  }

  test("streaming near-dup gate flags the same pairs as the batch path") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val idx = graft.ops.Dedup.minhashIndex(
      docs.where(col("doc_id") < 400), "doc_id", "text").persist()
    val newRows = docs.where(col("doc_id") >= 400)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val batch = graft.ops.Dedup.minhashNearDupAgainst(
        docs.where(col("doc_id") >= 400), "doc_id", "text", idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val stream = MemoryStream[(Long, String)]
    // two micro-batches: the gate's flag set must accumulate across them
    stream.addData(newRows.take(newRows.size / 2))
    stream.addData(newRows.drop(newRows.size / 2))
    val sq = graft.streaming.NearDupGate.flaggedPairs(
        stream.toDF().toDF("doc_id", "text"), "doc_id", "text", idx)
      .writeStream.format("memory").queryName("neardup_gate_test")
      .outputMode("append").start()
    sq.processAllAvailable()
    sq.stop()
    idx.unpersist()
    val streamed = spark.table("neardup_gate_test").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "corpus should contain planted near-dups")
    assert(streamed == batch)
  }

  test("voidStats: per-predicate triples/subjects/objects; NULL cells " +
      "count as the matchable nil VALUE, not as SQL-null holes") {
    import spark.implicits._
    val wide = Seq((1L, "a", null), (2L, "a", "x"), (3L, null, "x"))
      .toDF("id", "p1", "p2")
    val db = TripleDb.fromWideTable(wide, "t", "id")
    val got = TripleDb.voidStats(db).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      "k|p1" -> ((3L, 3L, 2L)),   // objects: s|a, n|
      "k|p2" -> ((3L, 3L, 2L))))  // objects: n|, s|x
  }

  test("streaming N-Triples ingest parses the same triples as batch load") {
    import graft.sources.NTriples
    val src = db(
      (k("a"), k("p"), s("hello \"world\"\nline two")),
      (k("b"), k("p"), l(9007199254740993L)),
      (k("c"), k("p"), TLangString("grüß", "de")))
    val dir = java.nio.file.Files.createTempDirectory("graft_nts").toString
    NTriples.save(src, dir)
    val sink = "nt_stream_test"
    val sq = NTriples.readStream(spark, dir)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    sq.processAllAvailable()
    sq.stop()
    val streamed = spark.table(sink).collect().map(r =>
      (Term.fromRow(r.getStruct(0)), Term.fromRow(r.getStruct(1)),
        Term.fromRow(r.getStruct(2)))).toSet
    assert(streamed == src.triples.toSet)
  }

  test("streaming entailed ingest: N-Triples stream → ρdf entailment " +
      "per micro-batch ≡ batch entailment (stateless stream-static joins)") {
    import graft.ops.Rdfs
    import graft.sources.NTriples
    val src = db(
      (k("alice"), k("manages"), k("bob")),
      (k("carol"), Rdfs.TypeP, k("intern")))
    val ont = db(
      (k("manages"), Rdfs.SubPropertyOf, k("knows")),
      (k("knows"), Rdfs.Domain, k("person")),
      (k("intern"), Rdfs.SubClassOf, k("employee")))
    val dir = java.nio.file.Files.createTempDirectory("graft_nte").toString
    NTriples.save(src, dir)
    val sink = "nt_entail_test"
    val sq = Rdfs.entailRows(NTriples.readStream(spark, dir), ont)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    sq.processAllAvailable()
    sq.stop()
    val streamed = spark.table(sink).collect().map(r =>
      (Term.fromRow(r.getStruct(0)), Term.fromRow(r.getStruct(1)),
        Term.fromRow(r.getStruct(2)))).toSet
    val batch = Rdfs.entailRows(src.df, ont).collect().map(r =>
      (Term.fromRow(r.getStruct(0)), Term.fromRow(r.getStruct(1)),
        Term.fromRow(r.getStruct(2)))).toSet
    assert(streamed == batch)
    assert(streamed((k("alice"), k("knows"), k("bob"))))
    assert(streamed((k("alice"), Rdfs.TypeP, k("person"))))
    assert(streamed((k("carol"), Rdfs.TypeP, k("employee"))))
  }

  test("stream state width: conf honored, default scale-adaptive (never " +
      "a fixed 8 at cluster parallelism), session width restored") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    // default derives from the session's parallelism, floor 8
    assert(SparkEntry.defaultStreamStateWidth(spark) ==
      math.max(8, spark.sparkContext.defaultParallelism / 4))
    SparkEntry.withStreamStateWidth(spark) {
      assert(spark.conf.get(key) ==
        SparkEntry.defaultStreamStateWidth(spark).toString)
    }
    assert(spark.conf.get(key) == before)
    // an explicit conf wins over the derived default
    spark.conf.set("spark.graft.stream.statePartitions", "13")
    try SparkEntry.withStreamStateWidth(spark) {
      assert(spark.conf.get(key) == "13")
    } finally spark.conf.unset("spark.graft.stream.statePartitions")
    assert(spark.conf.get(key) == before)
  }
}
