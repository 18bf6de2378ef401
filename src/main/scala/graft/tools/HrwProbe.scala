package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: does rendezvousShard stay inside whole-stage
  * codegen at production shard counts? (codegen.fallback=false makes a
  * 64KB generated-method blowout throw instead of silently
  * interpreting — the same probe that caught the PQ-tier forests.) */
object HrwProbe {
  def main(args: Array[String]): Unit = {
    val shards = if (args.nonEmpty) args(0).toInt else 256
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.fallback", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val df = spark.range(100000).toDF("doc_id")
      val t0 = System.nanoTime()
      val n = graft.ops.Sample.rendezvousShard(df, "doc_id", shards)
        .select("shard").distinct().count()
      println(f"HRWRES shards=$shards ok distinct=$n " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    } catch {
      case e: Throwable =>
        println(s"HRWRES FAIL shards=$shards: " +
          e.toString.linesIterator.next().take(300))
    }
    spark.stop()
  }
}
