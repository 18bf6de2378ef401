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
}
