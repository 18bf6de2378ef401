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
    * (the dynamic edge relation is built ONCE, persisted, and
    * pre-shuffled on `src`, so each round re-shuffles only the rank
    * table), one map-side-combined sum by `dst`, one left join back to
    * the receiver set. Lineage is cut with an eager `localCheckpoint`
    * every `checkpointEvery` rounds, the same barrier discipline as
    * [[Paths.closure]] — constant plan size at any iteration count.
    *
    * Static-source separation: a node with NO in-edges never receives
    * rank, so its rank is `scale` in round 1 and exactly `base` in
    * every later round — its per-edge contributions are two CONSTANT
    * vectors, pre-aggregated once instead of re-joined every round. On
    * star-schema / log-shaped graphs this removes the bulk of the
    * per-round join (orders→customer edges are ~90% of the 10× stress
    * graph); on cyclic graphs the static set is empty and the shape
    * degrades gracefully to the plain iteration. Long sums are
    * order-independent, so folding a pre-summed partial into the
    * per-round aggregation is bit-exact.
    */
  def pageRank(edges: DataFrame, iterations: Int,
               scale: Long = 1000000L,
               dampNum: Long = 85L, dampDen: Long = 100L,
               checkpointEvery: Int = 5): DataFrame = {
    require(iterations >= 0, "iteration count must be non-negative")
    require(scale > 0 && dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      "damping must be a fraction in [0, 1] and scale positive")
    val base = (dampDen - dampNum) * scale / dampDen
    // persisted: feeds eo AND the final static-node enumeration — an
    // unpersisted shared parent would replay the |edges| aggregation
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .persist()
    // persist: the edges⋈outdeg join feeds the static/dynamic split AND
    // both static-contribution sums — without it each derivation replays
    // the full |edges| aggregation+join
    val eo = edges.join(outdeg, "src")
      .select(col("src"), col("dst"), col("outdeg")).persist()
    val receivers = edges.select(col("dst").as("node")).distinct().persist()
    val rSrc = receivers.withColumnRenamed("node", "src")
    // pre-summed constant contributions from static sources — both
    // constant rank values (round 1 uses `scale`, later rounds `base`)
    // in ONE aggregation pass over the static edges
    val csBoth = eo.join(rSrc, Seq("src"), "left_anti")
      .select(col("dst").as("node"),
        expr(s"CAST($scale AS BIGINT) DIV outdeg").as("c1"),
        expr(s"CAST($base AS BIGINT) DIV outdeg").as("cN"))
      .groupBy("node").agg(sum(col("c1")).as("c1"), sum(col("cN")).as("cN"))
      .persist()
    val cs1 = csBoth.select(col("node"), col("c1").as("c"))
    val csN = csBoth.select(col("node"), col("cN").as("c"))
    val eoDyn = eo.join(rSrc, Seq("src"), "left_semi")
      .repartition(col("src")).persist()
    var ranks = receivers.select(col("node"), lit(scale).as("rank"))
    for (i <- 1 to iterations) {
      val perEdge = eoDyn.join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("rank DIV outdeg").as("c"))
      val contribs = perEdge.union(if (i == 1) cs1 else csN)
        .groupBy("node").agg(sum(col("c")).as("s"))
      ranks = receivers.join(contribs, Seq("node"), "left_outer")
        .select(col("node"),
          (lit(base) + expr(s"$dampNum * coalesce(s, 0L) DIV $dampDen"))
            .as("rank"))
      if (i % checkpointEvery == 0 && i < iterations)
        ranks = ranks.localCheckpoint()
    }
    // outdeg is unique per src already — no distinct pass needed to
    // enumerate the static (source-only) nodes
    val srcOnly = outdeg.select(col("src").as("node"))
      .join(receivers, Seq("node"), "left_anti")
    val staticRank = if (iterations == 0) scale else base
    // materialize the final ranks eagerly (ONE job materializes every
    // persisted input along the way) so the iteration caches can be
    // released before returning — no cached-RDD leak per call
    val result = ranks
      .union(srcOnly.select(col("node"), lit(staticRank).as("rank")))
      .persist()
    result.count()
    outdeg.unpersist(); eo.unpersist(); receivers.unpersist()
    eoDyn.unpersist(); csBoth.unpersist()
    result
  }
}
