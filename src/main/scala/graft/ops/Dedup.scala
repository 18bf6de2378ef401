package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines, each
  * designed around its 100 TB shuffle shape:
  *
  *  - exact / fingerprint dedup: one hash-partitioned groupBy (map-side
  *    combined), no all-pairs anything;
  *  - MinHash-LSH near-dup: banding turns the quadratic candidate
  *    problem into an equi-join shuffled by (band, bucket-hash) — only
  *    same-bucket docs are ever compared, and the exact-Jaccard verify
  *    runs on candidate pairs only;
  *  - SimHash: 64-bit fingerprints from one explode+groupBy, candidates
  *    via 8×8-bit bands (pigeonhole: hamming ≤ 7 ⟹ some band equal, so
  *    banding loses nothing at the ≤7 threshold).
  *
  * Verification thresholds use integer cross-multiplication, never
  * floats, so results are exactly reproducible by the SQL oracle.
  */
object Dedup {

  /** Exact dedup by content hash: one row per distinct key, keeping the
    * smallest id (deterministic winner) + group size. */
  def exactDedup(docs: DataFrame, idCol: String, keyExpr: Column): DataFrame =
    docs.groupBy(keyExpr.as("key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
      .select("keep_id", "n_dups")

  /** MinHash signature: `perms` minimums of per-permutation shingle
    * hashes (xxhash64 seeded by the permutation index). */
  def minhashSignature(shingleSet: Column, perms: Int): Column =
    transform(sequence(lit(0), lit(perms - 1)),
      p => array_min(transform(shingleSet, s => xxhash64(p, s))))

  /** LSH band hashes: split the signature into `bands` rows of
    * `rowsPerBand` and hash each band. */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))))

  /** Near-duplicate pairs by MinHash-LSH with exact-Jaccard verification.
    *
    * Returns (ia, ib) with ia < ib and word-`shingleN`-gram Jaccard
    * ≥ jNum/jDen. Candidates come ONLY from LSH bucket collisions —
    * the join is shuffled by (band, bandHash), never all-pairs — then
    * each candidate pair is verified against the exact shingle sets.
    * With 16×4 banding the s-curve midpoint is (1/16)^(1/4) ≈ 0.5, and
    * P(miss | J=0.9) ≈ 4e-8.
    *
    * Scale shape: band explode is ids+hashes only (shingle arrays are
    * NOT carried through the explode); shingle sets are re-joined just
    * for the verified candidate pairs.
    */
  def minhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          shingleN: Int = 3, perms: Int = 64,
                          bands: Int = 16, jNum: Int = 1, jDen: Int = 2): DataFrame = {
    val rowsPerBand = perms / bands
    val base = docs.select(col(idCol).as("id"),
      Text.shingles(col(textCol), shingleN).as("sh"))
    val banded = base
      .select(col("id"),
        posexplode(lshBands(minhashSignature(col("sh"), perms), bands, rowsPerBand))
          .as(Seq("band", "bh")))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"))
      .dropDuplicates("ia", "ib")
    verifyJaccard(cand, base, jNum, jDen)
  }

  /** Exact all-pairs shingle-Jaccard within small blocks (the honest
    * quadratic baseline — callers must bound the block). */
  def exactJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int, jNum: Int, jDen: Int): DataFrame = {
    val base = docs.select(col(idCol).as("id"),
      Text.shingles(col(textCol), shingleN).as("sh"))
    val cand = base.select(col("id").as("ia")).crossJoin(base.select(col("id").as("ib")))
      .where(col("ia") < col("ib"))
    verifyJaccard(cand, base, jNum, jDen)
  }

  /** J(a,b) ≥ num/den via integer cross-multiplication:
    * (den+num)·|∩| ≥ num·(|a|+|b|)  ⟺  |∩|/|∪| ≥ num/den. */
  private def verifyJaccard(cand: DataFrame, base: DataFrame,
                            jNum: Int, jDen: Int): DataFrame =
    cand
      .join(base.select(col("id").as("ia"), col("sh").as("sha")), "ia")
      .join(base.select(col("id").as("ib"), col("sh").as("shb")), "ib")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .where(lit(jDen + jNum) * col("inter") >=
        lit(jNum) * (size(col("sha")) + size(col("shb"))))
      .select("ia", "ib")

  /** 64-bit SimHash fingerprints: explode tokens once, sum a ±1 vote per
    * bit position, sign of the vote sets the bit. One shuffle (the
    * groupBy), 64 codegen'd sum aggregates.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("id"),
        explode(Text.tokens(col(textCol))).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val votes = (0 until 64).map(j =>
      sum(shiftrightunsigned(col("h"), j).bitwiseAND(1).cast("long") * 2 - 1).as(s"b$j"))
    tok.groupBy("id").agg(votes.head, votes.tail: _*)
      .select(col("id"),
        (0 until 64).map(j =>
          when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
  }

  /** Near-dup pairs by SimHash hamming distance ≤ maxHamming (must be
    * < 8): candidates via 8 bands of 8 bits — pigeonhole guarantees a
    * clean band for ≤7 bit flips, so banding has perfect recall here.
    */
  def simhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int = 7): DataFrame = {
    require(maxHamming < 8, "8x8 banding only guarantees recall for hamming <= 7")
    val sh = simhash(docs, idCol, textCol)
    val bandCols = (0 until 8).map(b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("simhash"), 8 * b).bitwiseAND(255).as("bh")))
    val banded = sh.select(col("id"), col("simhash"),
        explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("simhash"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        col("a.simhash").as("ha"), col("b.simhash").as("hb"))
      .dropDuplicates("ia", "ib")
    cand.where(bit_count(col("ha").bitwiseXOR(col("hb"))) <= maxHamming)
      .select("ia", "ib")
  }
}
