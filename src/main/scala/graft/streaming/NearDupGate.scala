package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming near-duplicate gate: incoming documents (a streaming
  * DataFrame) checked against a STATIC MinHash corpus index
  * ([[graft.ops.Dedup.minhashIndex]] layout) — the online admission
  * filter in front of a training corpus: tonight's crawl streams in,
  * anything near-duplicating the existing corpus is flagged before it
  * lands.
  *
  * Every stage is stream-safe: the new side's shingles + banded
  * MinHash are narrow per-row expressions, candidates come from a
  * stream-static equi-join on (band, hash) — stateless; the static
  * index side is an ordinary (persisted) relation — and exact Jaccard
  * verification is a second stream-static join on candidate ids only.
  * The single stateful operator is the final dropDuplicates on
  * (new, corpus) pairs (one pair can collide in several bands, and
  * exactly-once flagging is the point of a gate); its state is the
  * flagged-pair set itself — i.e. the deliverable, not an auxiliary
  * buffer. Semantics ≡ the batch
  * [[graft.ops.Dedup.minhashNearDupAgainst]]: q81 is pinned to the
  * same SQL oracle as the batch q73.
  */
object NearDupGate {

  /** Verified (ia = new id, ib = corpus id) near-dup pairs with
    * shingle-Jaccard ≥ jNum/jDen. Banding params must match the ones
    * `index` was built with.
    */
  def flaggedPairs(newDocs: DataFrame, idCol: String, textCol: String,
                   index: DataFrame,
                   shingleN: Int = 3, perms: Int = 64, bands: Int = 16,
                   jNum: Int = 1, jDen: Int = 2): DataFrame = {
    // the new side IS a minhashIndex of the arriving batch — same
    // shingle + banding code as the corpus index build, and the
    // verify threshold is Dedup's shared predicate, so the stream
    // path can't drift from the batch path it shares an oracle with
    val nb = graft.ops.Dedup
      .minhashIndex(newDocs, idCol, textCol, shingleN, perms, bands)
      .select(col("id").as("ia"), col("sh").as("sha"), col("bhs"))
    val cbe = index.select(col("id").as("ib"),
      posexplode(col("bhs")).as(Seq("band", "bh")))
    nb.select(col("ia"), col("sha"),
        posexplode(col("bhs")).as(Seq("band", "bh")))
      .join(cbe, Seq("band", "bh"))
      .select(col("ia"), col("sha"), col("ib"))
      .join(index.select(col("id").as("ib"), col("sh").as("shb")), "ib")
      .where(graft.ops.Dedup.jaccardAtLeast(col("sha"), col("shb"), jNum, jDen))
      .select("ia", "ib")
      .dropDuplicates("ia", "ib")
  }
}
