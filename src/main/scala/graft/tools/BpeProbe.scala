package graft.tools

import graft.Tables
import graft.ops.Text
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing probe for the distributed BPE trainer loop —
  * answers "where do the seconds of a 31-word iteration go" without
  * touching the production code path. Run:
  * `sbt "runMain graft.tools.BpeProbe /root/testdata/sf0.001 4"`.
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val iters = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    if (args.contains("--warm")) {
      t("warmRigs") {
        graft.SparkEntry.queries("q15_select_bag")(spark, dir).count()
        graft.SparkEntry.warmRigs(spark, dir)
      }
      spark.conf.set("spark.sql.shuffle.partitions", "32")
    }
    if (args.contains("--entry")) {
      t("q119 entry") {
        graft.SparkEntry.queries("q119_bpe_full_merges")(spark, dir).count()
      }
      spark.stop()
      return
    }
    if (args.contains("--direct")) {
      t("learnMergesDistributed") {
        graft.ops.Bpe.learnMergesDistributed(
          Tables.t(spark, dir, "documents"), "text", 16)
      }
      spark.stop()
      return
    }
    // mirror of the production learnLoop (localCheckpoint discipline),
    // with per-iteration phase timing — answers "is per-merge cost flat
    // with depth, and if not which phase grows"
    val docs = Tables.t(spark, dir, "documents")
    var seg = t("initial word count") {
      docs
        .select(explode(Text.tokens(col("text"))).as("w"))
        .where(col("w").rlike("^[a-z0-9]+$"))
        .groupBy("w").agg(count(lit(1)).as("n"))
        .select(regexp_replace(col("w"), "(.)", "($1)").as("seg"), col("n"))
        .localCheckpoint()
    }
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    for (i <- 0 until iters) {
      val top = t(s"iter $i argmax") {
        seg.select(col("n"),
            split(expr("trim(BOTH '()' FROM seg)"), "\\)\\(").as("s"))
          .select(col("n"), explode(arrays_zip(
            slice(col("s"), lit(1), size(col("s")) - 1).as("l"),
            slice(col("s"), lit(2), size(col("s")) - 1).as("r"))).as("pr"))
          .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
          .agg(sum(col("n")).as("cnt"))
          .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
          .limit(1).collect()
      }
      if (top.isEmpty) { System.err.println(s"[probe] exhausted at $i") }
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        seg = t(s"iter $i apply+ckpt") {
          seg.select(expr(s"replace(seg, '($l)($r)', '($l$r)')").as("seg"),
            col("n")).localCheckpoint()
        }
      }
    }
    spark.stop()
  }
}
