package graft.tools

import graft.core.{Term, TripleDb}
import graft.core.Term._
import graft.dsl._
import graft.engine.Projections
import graft.ops.Dedup
import org.apache.spark.sql.{functions, SparkSession}
import org.apache.spark.sql.functions._

/** Scale stress runs (beyond the driver's sf0.1 bench):
  *  1. BGP select over the unpivoted lineitem table — 6.6M triples at
  *     sf0.1, 6.6× the reference's 1M-triple "<10 s on a laptop" claim;
  *  2. MinHash near-dup over a 10× replicated+perturbed doc corpus.
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stress] $label%-44s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // 1. big-BGP: lineitem → 11 predicates × 600k rows = 6.6M triples
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("li_id", monotonically_increasing_id())
    val db = TripleDb.fromWideTable(li, "lineitem", "li_id",
      fks = Map("l_orderkey" -> "orders", "l_partkey" -> "part",
        "l_suppkey" -> "supplier"))
    println(s"[stress] triple count: ${db.df.count()}")
    time("2-pattern BGP select (full fact table)") {
      val n = Projections.selectDf(db, Seq(
        TriplePattern(V("l"), T(TKeyword("l_orderkey")), V("o")),
        TriplePattern(V("l"), T(TKeyword("l_quantity")), V("q"))),
        Seq(V("o"), V("q"))).count()
      println(s"[stress]   -> $n solutions")
    }
    time("3-pattern selective BGP (returnflag ground)") {
      val n = Projections.selectDf(db, Seq(
        TriplePattern(V("l"), T(TKeyword("l_returnflag")), T(TString("R"))),
        TriplePattern(V("l"), T(TKeyword("l_orderkey")), V("o")),
        TriplePattern(V("l"), T(TKeyword("l_extendedprice")), V("p"))),
        Seq(V("o"), V("p"))).count()
      println(s"[stress]   -> $n solutions")
    }

    // 2. dedup at 10×: replicate docs with id offsets; copies 0-4 keep
    // the text (exact near-dups across replicas), 5-9 drop the last word
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val reps = (0 until 10).map { r =>
      val txt = if (r < 5) col("text")
        else expr("array_join(slice(split(text, ' '), 1, size(split(text, ' ')) - 1), ' ')")
      docs.select((col("doc_id") + functions.lit(r * 10000000L)).as("doc_id"), txt.as("text"))
    }.reduce(_.unionByName(_))
    println(s"[stress] stress corpus: ${reps.count()} docs")
    time("minhash-LSH near-dup at 10x corpus") {
      val n = Dedup.minhashNearDupPairs(reps, "doc_id", "text").count()
      println(s"[stress]   -> $n verified near-dup pairs")
    }

    // 3. hot-predicate skew: 90% of a synthetic orders table points at
    // one customer (the rdf:type-skew analogue, SURVEY §4.2). With the
    // skew thresholds at cluster-realistic ratios, AQE must split the
    // hot partition (skew=true) instead of serializing it on one task.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    time("skewed FK BGP join (90% hot customer)") {
      val skewed = spark.range(500000).select(
        col("id").as("o_orderkey"),
        when(rand(7) < 0.9, 0L).otherwise(col("id") % 15000).as("o_custkey"),
        md5(col("id").cast("string")).as("o_comment"))
      val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      val sdb = TripleDb.union(
        TripleDb.fromWideTable(skewed, "orders", "o_orderkey",
          fks = Map("o_custkey" -> "customer")),
        TripleDb.fromWideTable(cust, "customer", "c_custkey"))
      // carry the incompressible comment through the hot join — that is
      // what makes the skewed partition big in bytes, not just rows
      val q = Projections.selectDf(sdb, Seq(
        TriplePattern(V("o"), T(TKeyword("o_custkey")), V("c")),
        TriplePattern(V("o"), T(TKeyword("o_comment")), V("cm")),
        TriplePattern(V("c"), T(TKeyword("c_name")), V("n"))),
        Seq(V("o"), V("n"), V("cm")))
      // act on THIS df (count() plans a separate query execution whose
      // column pruning also drops the payload that makes the skew real)
      val agg = q.select(count(functions.lit(1)).as("n"),
        max(length(col("cm.lex"))).as("w"))
      val n = agg.collect()(0).getLong(0)
      val planStr = agg.queryExecution.executedPlan.toString
      println(s"[stress]   -> $n rows; AQE skew split: " +
        planStr.contains("skew=true"))
      if (!planStr.contains("skew=true"))
        println(planStr.linesIterator
          .filter(l => l.contains("Join") || l.contains("AQEShuffleRead"))
          .mkString("[stress] plan joins:\n", "\n", ""))
    }
    spark.stop()
  }
}
