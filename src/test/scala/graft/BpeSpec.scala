package graft

import graft.ops.{Bpe, Text}
import org.apache.spark.sql.functions._

/** BPE learn + encode against hand-computed fixtures (the classic
  * Sennrich low/lower/newest/widest corpus) and corpus-level
  * invariants. */
class BpeSpec extends GraftSpec {

  import Bpe.Merge

  // corpus: low ×5, lower ×2, newest ×6, widest ×3 — the worked example
  // from Sennrich et al. (2016). Hand-derived first merges:
  //   pair counts: (e,s)=9, (s,t)=9, (w,e)=8(newest)+... compute:
  //   low×5: (l,o)(o,w) ×5 ; lower×2: (l,o)(o,w)(w,e)(e,r)
  //   newest×6: (n,e)(e,w)(w,e)(e,s)(s,t) ; widest×3: (w,i)(i,d)(d,e)(e,s)(s,t)
  //   → (e,s)=9, (s,t)=9, (l,o)=7, (o,w)=7, (w,e)=8 …
  //   argmax ties 9: (e,s) < (s,t) lexicographically → merge 0 = (e,s)
  //   then (es,t)=9 wins; then (l,o)=7 vs (o,w)=7 vs (w,e)=8 → (w,e)? no:
  //   after est, pairs: lower has (w,e); newest has (e,w)? n,e,w,est →
  //   (n,e)=6,(e,w)=6,(w,est)=6; widest: w,i,d,est → (w,i)(i,d)(d,est)=3
  //   low/lower keep (l,o)=7,(o,w)=7; lower: (w,e)=2,(e,r)=2
  //   → max 7, tie (l,o) < (o,w) → merge 2 = (l,o)
  private def fixture = {
    import spark.implicits._
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
  }

  test("learnMerges reproduces the hand-computed Sennrich fixture") {
    val m = Bpe.learnMerges(fixture, "text", 3)
    assert(m == Seq(Merge(0, "e", "s"), Merge(1, "es", "t"),
      Merge(2, "l", "o")))
  }

  test("encode applies merges lowest-rank-first, all occurrences") {
    import spark.implicits._
    val m = Bpe.learnMerges(fixture, "text", 3)
    val enc = Bpe.encode(fixture.where(col("doc_id").isin(0L, 5L, 7L, 13L)),
        "doc_id", "text", m)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toList).toMap
    assert(enc(0L) == List("lo", "w"))
    assert(enc(5L) == List("lo", "w", "e", "r"))
    assert(enc(7L) == List("n", "e", "w", "est"))
    assert(enc(13L) == List("w", "i", "d", "est"))
  }

  test("priority encode: a lower-rank merge enabled by a higher-rank " +
    "one is still applied (the case rank-order application misses)") {
    import spark.implicits._
    // merges crafted so applying rank 2 (b,c)→bc creates the pair
    // (a,bc) of rank 1, which a one-pass rank-order fold would skip
    val m = Seq(Merge(0, "x", "y"), Merge(1, "a", "bc"), Merge(2, "b", "c"))
    val df = Seq((1L, "abc")).toDF("doc_id", "text")
    val got = Bpe.encode(df, "doc_id", "text", m)
      .orderBy("pos").collect().map(_.getString(2)).toList
    assert(got == List("abc"))
  }

  test("token ids are the sorted-vocab ranks, dense from 0") {
    val m = Bpe.learnMerges(fixture, "text", 3)
    val rows = Bpe.encode(fixture, "doc_id", "text", m)
      .select("token", "token_id").distinct()
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
    val toks = rows.map(_._1).toList
    assert(rows.map(_._2).toList == rows.indices.map(_.toLong).toList)
    assert(toks == toks.sorted)
  }

  test("learn + encode on the corpus: counts match, memo-safe, " +
    "round-trip concatenation preserves every word") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.t(spark, dir, "documents")
    val m = Bpe.learnMerges(docs, "text", 16, topWords = 200)
    assert(m.size == 16 && m.map(_.rank) == (0 until 16))
    // every document's subword stream concatenates back to its words
    val joined = docs.select(col("doc_id"),
        concat_ws("", Text.tokens(col("text"))).as("w0"),
        concat_ws("", Bpe.encodeTokens(col("text"), m)).as("w1"))
      .where(col("w0") =!= col("w1")).count()
    assert(joined == 0L)
    // subword count >= word count is NOT generally true (merges shrink);
    // but count equals size of encodeTokens and is stable across plans
    val a = docs.select(sum(Bpe.tokenCount(col("text"), m))).head().getLong(0)
    val b = docs.repartition(7)
      .select(sum(Bpe.tokenCount(col("text"), m))).head().getLong(0)
    assert(a == b && a > 0)
  }

  test("distributed corpus-complete trainer ≡ driver trainer on the " +
    "full dictionary (same argmax + tie-breaks)") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.t(spark, dir, "documents").where(col("doc_id") < 120)
    // topWords far beyond the slice's vocabulary = the driver trainer
    // sees the FULL dict too, so the two must be bit-equal
    val driver = Bpe.learnMerges(docs, "text", 12, topWords = 1000000)
    val dist = Bpe.learnMergesDistributed(docs, "text", 12)
    assert(dist == driver)
    assert(dist.size == 12 && dist.map(_.rank) == (0 until 12))
    // the top-K trainer genuinely diverges on this corpus slice for a
    // small K (long-tail pairs exist) — otherwise q119 would not be
    // testing anything the bounded trainer doesn't
    val bounded = Bpe.learnMerges(docs, "text", 12, topWords = 20)
    assert(bounded != dist, "full-dict learning must see the tail")
    // minCount drops hapax words from the dictionary before learning
    val noHapax = Bpe.learnMergesDistributed(docs, "text", 4, minCount = 2)
    assert(noHapax.size == 4)
  }

  test("merge table round-trips through the durable parquet artifact, " +
    "rank order preserved") {
    val m = Seq(Merge(0, "e", "s"), Merge(1, "es", "t"), Merge(2, "l", "o"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_merges").toString
    Bpe.saveMerges(spark, m, tmp)
    assert(Bpe.loadMerges(spark, tmp) == m)
  }

  test("distributed trainer frees its checkpoints: cached-RDD count " +
    "does not grow with merges (a 100k-merge build must not pin one " +
    "dead dict copy per iteration)") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.t(spark, dir, "documents").where(col("doc_id") < 120)
    def cached = spark.sparkContext.getPersistentRDDs.size
    val before = cached
    Bpe.learnMergesDistributed(docs, "text", 10)
    assert(cached <= before,
      s"trainer leaked checkpoint blocks: $before -> $cached")
  }
}
