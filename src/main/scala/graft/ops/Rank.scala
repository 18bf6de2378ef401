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
    * Scale shape per iteration: one join edges⋈contribs co-keyed on
    * `src` (the dynamic edge relation is built ONCE, persisted, and
    * pre-shuffled on `src`, so each round re-shuffles only the
    * contribution table) and one map-side-combined sum by `dst` — the
    * rank-of-missing-receiver case is a `coalesce` inside the join
    * projection, so no per-round join back to the receiver set, and
    * round 1 (every rank = the constant `scale`) is aggregation-only.
    * Lineage is cut with an eager `localCheckpoint` every
    * `checkpointEvery` rounds, the same barrier discipline as
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
    *
    * Classification is ONE pass: a single union-groupBy computes
    * (outdeg, indeg) per node, so receiver-ness (indeg > 0) and
    * static-ness (indeg = 0) are FILTERS over one cached degree frame —
    * not the previous left_anti/left_semi/distinct join cascade (three
    * extra shuffles + two extra joins that dominated wall time at
    * bench scale; the per-round shape is unchanged).
    */
  def pageRank(edges: DataFrame, iterations: Int,
               scale: Long = 1000000L,
               dampNum: Long = 85L, dampDen: Long = 100L,
               checkpointEvery: Int = 5): DataFrame = {
    require(iterations >= 0, "iteration count must be non-negative")
    require(scale > 0 && dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      "damping must be a fraction in [0, 1] and scale positive")
    val base = (dampDen - dampNum) * scale / dampDen
    // the caller's edge relation is often itself a union of scans —
    // evaluate it ONCE; deg and the tag join below both re-read it
    val e = edges.select(col("src"), col("dst")).persist()
    // one shuffle classifies every node: outdeg, and indeg>0 decides
    // receiver (gets rank rows) vs static source (constant contributor).
    // explode, not self-union: one pass over the cached edges instead
    // of two. persisted: feeds the edge tag join, the initial rank
    // vector, the per-round receiver set, and the final static-node
    // enumeration
    val deg = e.select(explode(array(
        struct(col("src").as("node"), lit(1L).as("o"), lit(0L).as("i")),
        struct(col("dst").as("node"), lit(0L).as("o"), lit(1L).as("i")))).as("x"))
      .select(col("x.node").as("node"), col("x.o").as("o"), col("x.i").as("i"))
      .groupBy("node")
      .agg(sum(col("o")).as("outdeg"), sum(col("i")).as("indeg"))
      .persist()
    val receivers = deg.where(col("indeg") > 0).select(col("node")).persist()
    // tag every edge with its src's outdeg and static-ness in ONE join
    val eoTag = e.join(
        deg.select(col("node").as("src"), col("outdeg"),
          (col("indeg") === 0).as("static")), "src")
      .select(col("src"), col("dst"), col("outdeg"), col("static"))
      .persist()
    // pre-summed constant contributions from static sources — both
    // constant rank values (round 1 uses `scale`, later rounds `base`)
    // in ONE aggregation pass over the static edges
    val csBoth = eoTag.where(col("static"))
      .select(col("dst").as("node"),
        expr(s"CAST($scale AS BIGINT) DIV outdeg").as("c1"),
        expr(s"CAST($base AS BIGINT) DIV outdeg").as("cN"))
      .groupBy("node").agg(sum(col("c1")).as("c1"), sum(col("cN")).as("cN"))
      .persist()
    val cs1 = csBoth.select(col("node"), col("c1").as("c"))
    val csN = csBoth.select(col("node"), col("cN").as("c"))
    // dynamic edges pre-shuffled on src so each round moves only ranks
    val eoDyn = eoTag.where(!col("static"))
      .select(col("src"), col("dst"), col("outdeg"))
      .repartition(col("src")).persist()
    // The loop state is the CONTRIBUTION SUM frame, not the rank frame:
    // a receiver absent from contribs has rank exactly `base`, so the
    // "join ranks back to all receivers" step folds into a coalesce at
    // the NEXT round's edge join — one join + one aggregation per round
    // instead of two joins + one aggregation, and round 1 (all ranks =
    // the constant `scale`) needs no join at all. Ranks materialize as
    // a real frame once, after the last round. Bit-identical algebra:
    // rank_i(n) = base + dampNum·coalesce(s_i(n), 0) DIV dampDen.
    def rankExpr = s"$base + $dampNum * coalesce(s, 0L) DIV $dampDen"
    var contribs: DataFrame = null
    for (i <- 1 to iterations) {
      val perEdge =
        if (i == 1)
          eoDyn.select(col("dst").as("node"),
            expr(s"CAST($scale AS BIGINT) DIV outdeg").as("c"))
        else
          eoDyn.join(contribs.withColumnRenamed("node", "src"),
              Seq("src"), "left_outer")
            .select(col("dst").as("node"),
              expr(s"($rankExpr) DIV outdeg").as("c"))
      contribs = perEdge.union(if (i == 1) cs1 else csN)
        .groupBy("node").agg(sum(col("c")).as("s"))
      if (i % checkpointEvery == 0 && i < iterations)
        contribs = contribs.localCheckpoint()
    }
    val ranks =
      if (iterations == 0) receivers.select(col("node"), lit(scale).as("rank"))
      else receivers.join(contribs, Seq("node"), "left_outer")
        .select(col("node"), expr(rankExpr).as("rank"))
    val srcOnly = deg.where(col("indeg") === 0).select(col("node"))
    val staticRank = if (iterations == 0) scale else base
    // materialize the final ranks eagerly (ONE job materializes every
    // persisted input along the way) so the iteration caches can be
    // released before returning — no cached-RDD leak per call
    val result = ranks
      .union(srcOnly.select(col("node"), lit(staticRank).as("rank")))
      .persist()
    result.count()
    e.unpersist(); deg.unpersist(); receivers.unpersist()
    eoTag.unpersist(); eoDyn.unpersist(); csBoth.unpersist()
    result
  }
}
