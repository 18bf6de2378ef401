package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the stage that turns
  * near-duplicate PAIRS (minhash/simhash/cosine, q21/q22/q41) into
  * duplicate GROUPS with a canonical representative, completing the
  * dedup pipeline: pairs → components → keep min-id per component.
  *
  * Implemented as iterative min-label propagation on DataFrames
  * (≙ the alternating-star MapReduce CC shape): each round every node
  * takes the min label among itself and its neighbors — one
  * edge⋈label join + one groupBy per round, converging in
  * graph-diameter rounds (near-dup clusters have tiny diameters).
  * Labels persist per round with the same lineage discipline as
  * [[Paths.closure]]; edges stay cached across rounds. No GraphX —
  * the joins stay Catalyst-planned (broadcast/AQE/codegen apply).
  */
object Components {

  /** (id, component) for every node appearing in `edges`; component =
    * min node id of the connected component (deterministic labels).
    * Undirected: (a,b) implies (b,a). Throws if not converged within
    * `maxIter` rounds (diameter bound).
    */
  def connected(edges: DataFrame, srcCol: String, dstCol: String,
                maxIter: Int = 20): DataFrame = {
    // NOT pre-clustered by the join key: round 15 measured adding
    // .repartition(col("b")) here (so rounds skip the edge-side
    // exchange) as consistently net-negative at sf0.1 — q52 +0.38 s,
    // q53 +0.48 s, q80 +0.49 s, q121 +0.31 s (3× interleaved, clean
    // control); the setup shuffle + per-round cache decode outweigh
    // the saved 32-partition exchange. See Paths.closureEdges's note.
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .dropDuplicates("a", "b")
      .persist()
    var labels = e.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var i = 0
    while (i < maxIter) {
      // neighbor labels: comp(b) proposed to a, plus own label
      val proposals = e.join(labels.select(col("id").as("b"), col("comp")), "b")
        .select(col("a").as("id"), col("comp"))
        .unionByName(labels)
      val next = proposals.groupBy("id").agg(min(col("comp")).as("comp"))
        .localCheckpoint()
      val changed = next.as("n")
        .join(labels.as("l"), col("n.id") === col("l.id"))
        .where(col("n.comp") =!= col("l.comp"))
        .limit(1).isEmpty
      val done = changed // no differing row found
      labels = next
      if (done) { e.unpersist(); return labels }
      i += 1
    }
    e.unpersist()
    throw new IllegalStateException(
      s"connected components did not converge within $maxIter rounds")
  }

  /** Dedup keep-list: for each component of the near-dup pair graph,
    * keep the smallest id; nodes with no edges are implicitly kept
    * (they form no component row — callers anti-join the drop set).
    */
  def dropSet(pairs: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val comp = connected(pairs, srcCol, dstCol)
    comp.where(col("id") =!= col("comp")).select(col("id").as("drop_id"))
  }

  /** Per-node triangle participation over an undirected edge set — on
    * a near-dup similarity graph, triangle density separates tight
    * duplicate clusters from chance pairings (a cluster-quality signal
    * before committing to a keep-list). Input edges are canonical
    * (src < dst, as [[Similarity.cosinePairs]] emits); each triangle
    * a<b<c is found exactly once by the standard two-join wedge close
    * (e(a,b) ⋈ e(b,c) ⋈ e(a,c)) and credited to all three corners.
    *
    * Scale shape: two equi-joins on node keys — the classic
    * distributed triangle enumeration. The canonical orientation IS
    * the degree trick's cheap form: every wedge is enumerated from its
    * middle-ordered node only, so no triangle is joined three times.
    * Output: (id, n_triangles), nodes in ≥1 triangle.
    *
    * Input need not be canonical: edges are re-oriented (least, greatest),
    * self-loops dropped, and duplicates removed here — one bounded pass
    * on an already-small pair relation, so a caller passing duplicated
    * or reversed pairs can't silently over/undercount.
    */
  def triangleCounts(edges: DataFrame, srcCol: String,
                     dstCol: String): DataFrame = {
    val e = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b"))
      .dropDuplicates("a", "b")
    // wedges a<b<c through middle b, closed by the (a,c) edge
    val tri = e.join(e.select(col("a").as("b"), col("b").as("c")), "b")
      .join(e.select(col("a"), col("b").as("c")), Seq("a", "c"), "left_semi")
      .select(col("a"), col("b"), col("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
  }
}
