package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan/timing inspector: `runMain graft.tools.Explain <query> [sfDir]`
  * prints the formatted physical plan and wall time of one
  * SparkEntry query.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // mirror Bench/Verify so inspected plans are the shipped plans
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      .getOrCreate()
    // same A/B knob as Bench: "k=v,k=v" extra confs (e.g. lowering AQE
    // skew thresholds to observe skew handling on small fixtures —
    // thresholds are byte-based and sized for production data)
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(",").foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => spark.conf.set(k, v)
        case _ => sys.error(s"SPARK_GRAFT_EXTRA_CONF entry '$kv' is not k=v")
      }
    })
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    // foreach + accumulator: an action on THIS DataFrame (so its
    // queryExecution carries the AQE final plan — count() would plan a
    // separate execution) without collecting the result to the driver
    val acc = spark.sparkContext.longAccumulator("rows")
    df.foreach(_ => acc.add(1))
    println(f"== $name%s: ${acc.value}%d rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    println(df.queryExecution.executedPlan.toString.linesIterator
      .take(30).mkString("\n"))
    spark.stop()
  }
}
