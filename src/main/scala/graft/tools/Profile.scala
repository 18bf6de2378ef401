package graft.tools

import graft.ops.{Dedup, Text}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the minhash pipeline (scratch diagnostics). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("read+count")(docs.count())
    val base = docs.select(col("doc_id").as("id"),
      Text.shingles(col("text"), 3).as("sh"))
    time("shingles")(base.count())
    val sig = base.select(col("id"),
      Dedup.minhashSignature(col("sh"), 64).as("sig"))
    time("minhash sigs")(sig.count())
    val banded = base.select(col("id"),
      posexplode(graft.functions.TextExpressions.minhashBandHashes(col("sh"), 64, 16))
        .as(Seq("band", "bh")))
    time("banded")(banded.count())
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib")).dropDuplicates("ia", "ib")
    time("candidates")(cand.count())
    time("full pipeline")(
      Dedup.minhashNearDupPairs(docs, "doc_id", "text").count())
    time("simhash fingerprints")(
      Dedup.simhash(docs, "doc_id", "text").count())
    time("simhash pairs")(
      Dedup.simhashNearDupPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
