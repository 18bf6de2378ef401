package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-analysis ranking over an edge relation. */
object Rank {

  /** Fixed-point PageRank in scaled integers: ranks live as longs
    * scaled by `scale` (1.0 ≡ `scale`), per-edge contributions are
    * `rank DIV outdeg`, and the damped update is
    * `(1−d)·scale + (d_num · Σcontribs) DIV d_den` — all integer
    * arithmetic.
    *
    * Why integers: double-sum PageRank is not even deterministic on
    * one engine (a `groupBy().sum()` of doubles depends on partition
    * merge order), let alone across engines. Long sums are
    * order-independent, so scaled-integer ranks are bit-stable across
    * runs, partitionings, and SQL replays, at a quantization error of
    * ~outdeg/scale per node per round (≪ 1e-4 at the default scale) —
    * the right trade for a reproducible curation signal. Dangling-node
    * mass is dropped (the standard simplification; ranks are relative,
    * not a normalized distribution).
    *
    * Scale shape per iteration: one join edges⋈ranks co-keyed on `src`
    * (the edges-with-outdeg relation is built ONCE, persisted, and
    * pre-shuffled on `src`, so each round re-shuffles only the rank
    * table — |nodes|, not |edges|), one map-side-combined sum by `dst`,
    * one left join back to the node set. Lineage is cut with an eager
    * `localCheckpoint` every `checkpointEvery` rounds, the same
    * barrier discipline as [[Paths.closure]] — constant plan size at
    * any iteration count.
    */
  def pageRank(edges: DataFrame, iterations: Int,
               scale: Long = 1000000L,
               dampNum: Long = 85L, dampDen: Long = 100L,
               checkpointEvery: Int = 5): DataFrame = {
    require(iterations >= 0, "iteration count must be non-negative")
    require(scale > 0 && dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      "damping must be a fraction in [0, 1] and scale positive")
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val eo = edges.join(outdeg, "src")
      .select(col("src"), col("dst"), col("outdeg"))
      .repartition(col("src")).persist()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct().persist()
    val base = (dampDen - dampNum) * scale / dampDen
    var ranks = nodes.select(col("node"), lit(scale).as("rank"))
    for (i <- 1 to iterations) {
      val contribs = eo.join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("rank DIV outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      ranks = nodes.join(contribs, Seq("node"), "left_outer")
        .select(col("node"),
          (lit(base) + expr(s"$dampNum * coalesce(s, 0L) DIV $dampDen"))
            .as("rank"))
      if (i % checkpointEvery == 0 && i < iterations)
        ranks = ranks.localCheckpoint()
    }
    // materialize the final ranks eagerly so the iteration caches can
    // be released before returning — no cached-RDD leak per call (the
    // minhashNearDupPairs discipline)
    val result = ranks.persist()
    result.count()
    eo.unpersist()
    nodes.unpersist()
    result
  }
}
