package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed frequency/cardinality sketches for corpus profiling at
  * scale: Count-Min (point-frequency estimates, heavy-hitter probes)
  * and HyperLogLog (approximate distinct counts, mergeable across
  * shards). The reference engine has no sketch surface (its stores are
  * in-memory, alpha.clj:54-58); these are the extension-tier primitives
  * a 100 TB curation pipeline reaches for when an exact `groupBy` over
  * the full key space is itself the bottleneck (e.g. vocabulary
  * statistics over trillions of tokens).
  *
  * Hashing follows the [[Dedup]] precedent: XXH64 is the fast default;
  * `useMd5 = true` switches to md5-derived addressing (~2× slower per
  * item) whose every counter and register is exactly reproducible by
  * an ANSI-SQL oracle — that is what lets the driver hash-compare the
  * *sketch itself*, not just derived answers.
  *
  * Scale shapes:
  *  - [[countMin]] is one narrow pass + a map-side-combined groupBy to
  *    at most depth×width rows — the shuffle carries the sketch, never
  *    the items. Estimates join the (tiny, broadcast) sketch, whose
  *    (depth, width) travel WITH it in [[CountMin]] so probe
  *    addressing can never silently diverge from build addressing.
  *  - [[hllRegisters]] reduces to ≤ 2^p rows the same way; union of
  *    sketches is max-per-register ([[hllMerge]]), so shard-local
  *    sketches combine without re-scanning — the property that makes
  *    HLL the standard distributed-distinct structure.
  */
object Sketch {

  /** A built Count-Min sketch: the counter frame plus the addressing
    * parameters it was built with. Estimates derive (depth, width)
    * from here — a mismatched probe addressing cannot be expressed. */
  final case class CountMin(sketch: DataFrame, depth: Int, width: Int,
                            useMd5: Boolean)

  /** Counter address of `item` in CM row `row`: independent hash per
    * row via a distinct seed/prefix. */
  private def cmsBucket(item: Column, row: Int, width: Int,
                        useMd5: Boolean): Column =
    if (useMd5)
      pmod(Sample.md5Prefix32(concat(lit(s"cms${row}_"), item)),
        lit(width.toLong))
    else
      pmod(xxhash64(lit(s"cms${row}_"), item), lit(width.toLong))

  /** Build a Count-Min sketch over an item column (callers tokenize /
    * project upstream). The frame holds (`row`, `bucket`, `cnt`) — at
    * most depth×width rows; absent rows are implicit zero counters.
    * Standard error: est ≤ true + 2N/width with prob 1−(1/2)^depth.
    */
  def countMin(items: DataFrame, itemCol: String, depth: Int = 4,
               width: Int = 256, useMd5: Boolean = false): CountMin =
    CountMin(
      items.select(posexplode(array((0 until depth).map(i =>
          cmsBucket(col(itemCol), i, width, useMd5)): _*))
          .as(Seq("row", "bucket")))
        .groupBy("row", "bucket").agg(count(lit(1)).as("cnt")),
      depth, width, useMd5)

  /** Point-frequency estimates for a probe set: est(item) = min over
    * rows of the addressed counter (never under the true count). The
    * sketch side broadcasts — probes can be arbitrarily large and
    * never shuffle. */
  def cmsEstimate(cm: CountMin, probes: DataFrame,
                  itemCol: String): DataFrame =
    probes.select(col(itemCol),
        posexplode(array((0 until cm.depth).map(i =>
          cmsBucket(col(itemCol), i, cm.width, cm.useMd5)): _*))
          .as(Seq("row", "bucket")))
      .join(broadcast(cm.sketch), Seq("row", "bucket"), "left")
      .groupBy(itemCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Register count shared by [[hllRegisters]] (which hard-codes p = 8:
    * top 8 hash bits address the register) and [[hllEstimate]]'s default
    * `m` — one constant so builder and estimator cannot disagree. */
  val HllM = 256

  /** HyperLogLog register frame over an item column: p = 8 → m = 256
    * registers, standard error 1.04/√m ≈ 6.5%; rho = 1 + leading-zero
    * bits of a 56-bit hash tail. Fast path: register/tail from
    * xxhash64 bits, leading zeros via the binary-string length (both
    * codegen'd). Oracle path (`useMd5`): register = first 2 md5
    * nibbles and the leading-zero count is hex-string arithmetic
    * (zero-nibble prefix length × 4 + a CASE on the first non-zero
    * nibble) — the identical expression runs in Spark and the SQL
    * oracle, no float/bit-intrinsic divergence possible. Output:
    * (`register`, `max_rho`), ≤ 256 rows, same schema either mode.
    */
  def hllRegisters(items: DataFrame, itemCol: String,
                   useMd5: Boolean = false): DataFrame = {
    val (reg, rho) =
      if (useMd5) {
        val h = md5(col(itemCol))
        val stripped = regexp_replace(substring(h, 3, 14), "^0+", "")
        val firstNib = substring(stripped, 1, 1)
        val nibLz = when(firstNib === "1", 3)
          .when(firstNib.isin("2", "3"), 2)
          .when(firstNib.isin("4", "5", "6", "7"), 1)
          .otherwise(0)
        (conv(substring(h, 1, 2), 16, 10).cast("int"),
          when(length(stripped) === 0, lit(57))
            .otherwise((lit(14) - length(stripped)) * 4 + nibLz + lit(1)))
      } else {
        val h = xxhash64(col(itemCol))
        // top 8 bits → register; low 56 bits → tail. bin() drops
        // leading zeros, so rho = 57 − bits(tail), 57 when tail = 0.
        val tail = h.bitwiseAND(lit((1L << 56) - 1))
        (shiftrightunsigned(h, 56).cast("int"),
          when(tail === 0, lit(57)).otherwise(lit(57) - length(bin(tail))))
      }
    items.select(reg.as("register"), rho.cast("int").as("rho"))
      .groupBy("register").agg(max(col("rho")).as("max_rho"))
  }

  /** HLL union: sketches merge by max per register — shard-local
    * sketches combine without touching the shards again. */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.union(b).groupBy("register").agg(max(col("max_rho")).as("max_rho"))

  /** The standard HLL estimator (Flajolet et al. 2007: harmonic mean +
    * small-range linear counting) over a register frame. Driver-side
    * scalar — the frame is ≤ m rows by construction. `m` defaults to
    * [[HllM]], the register count [[hllRegisters]] builds (p = 8);
    * register ids outside [0, m) mean the two disagreed, so fail loud
    * instead of silently skewing the estimate. */
  def hllEstimate(registers: DataFrame, m: Int = HllM): Double = {
    val regs = registers.collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    require(regs.keys.forall(j => j >= 0 && j < m),
      s"register id outside [0, $m) — registers were built with a " +
        s"different precision than this estimator's m")
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val zSum = (0 until m)
      .map(j => math.pow(2.0, -regs.getOrElse(j, 0).toDouble)).sum
    val e = alpha * m * m / zSum
    val zeros = m - regs.size
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }

  // --------------------------------------------------------------------
  // Log-linear quantile sketch (the HDR-histogram / DDSketch bucket
  // family, all-integer): value v ≥ 1 lands in bucket e·k + sub with
  // e = floor(log2 v) (= bit-length − 1, the q90 bin-string trick) and
  // sub = ((v − 2^e)·k) DIV 2^e ∈ [0, k); v = 0 gets bucket −1.
  // Bucket width ≤ 2^e/k + 1, so a quantile read off the bucket lower
  // bound has relative error ≤ 1/k. Deterministic — no sampling, no
  // randomized compaction (KLL's) — hence exactly replayable by the
  // SQL oracle at register level, like countMin/hllRegisters.
  //
  // Scale shapes: build is one narrow projection + a map-side-combined
  // groupBy to ≤ 64·k rows — the shuffle carries the sketch, never the
  // values; merge is bucket-wise ADD (union + sum) without re-scanning
  // shards; the streaming build is the same aggregation under
  // outputMode(complete), so stream ≡ batch share one oracle.
  // --------------------------------------------------------------------

  /** Bucket id of a non-negative value column (named by `valueCol`).
    * Negative values fail loud — a quantile sketch of counts/sizes
    * that silently folded sign would misreport every percentile. */
  def hdrBucket(valueCol: String, k: Int = 16): Column = {
    require(k >= 1, "k must be >= 1")
    // For e ≥ 32 the multiply-first sub ((v−2^e)·k) DIV 2^e can
    // overflow BIGINT (silently wrapping in non-ANSI Spark, erroring
    // in the DuckDB oracle), so large decades divide FIRST:
    // (v−2^e) DIV (2^e DIV k) — bit-identical when k divides 2^e
    // (any power-of-two k, e ≥ log2 k), and clamped to k−1 so the
    // sub-bucket invariant sub ∈ [0, k) holds for every k.
    expr(
      s"""CASE
         |  WHEN $valueCol < 0 THEN CAST(raise_error(
         |    'hdr sketch requires non-negative values') AS BIGINT)
         |  WHEN $valueCol = 0 THEN CAST(-1 AS BIGINT)
         |  WHEN length(bin($valueCol)) - 1 < 32 THEN
         |    CAST(length(bin($valueCol)) - 1 AS BIGINT) * $k
         |    + (($valueCol - shiftleft(CAST(1 AS BIGINT),
         |         length(bin($valueCol)) - 1)) * $k)
         |      DIV shiftleft(CAST(1 AS BIGINT), length(bin($valueCol)) - 1)
         |  ELSE
         |    CAST(length(bin($valueCol)) - 1 AS BIGINT) * $k
         |    + least(CAST(${k - 1} AS BIGINT),
         |        ($valueCol - shiftleft(CAST(1 AS BIGINT),
         |           length(bin($valueCol)) - 1))
         |        DIV (shiftleft(CAST(1 AS BIGINT),
         |           length(bin($valueCol)) - 1) DIV $k))
         |END""".stripMargin)
  }

  /** Smallest value a bucket can hold: 2^e + (sub·2^e) DIV k (0 for
    * the zero bucket) — the deterministic quantile estimate. */
  def hdrBucketLow(bucketCol: String, k: Int = 16): Column =
    expr(
      s"""CASE WHEN $bucketCol = -1 THEN CAST(0 AS BIGINT)
         |  ELSE shiftleft(CAST(1 AS BIGINT), CAST($bucketCol DIV $k AS INT))
         |    + (($bucketCol % $k) * shiftleft(CAST(1 AS BIGINT),
         |         CAST($bucketCol DIV $k AS INT))) DIV $k
         |END""".stripMargin)

  /** Build the sketch: (bucket, cnt), at most 64·k + 1 rows. Works on
    * batch AND streaming frames (groupBy-count is a streaming-legal
    * aggregation under complete mode — the q89 pattern). */
  def hdrSketch(df: DataFrame, valueCol: String, k: Int = 16): DataFrame =
    df.select(hdrBucket(valueCol, k).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Sketch union: bucket-wise add — shard-local sketches combine
    * without re-scanning the shards (the hllMerge property). */
  def hdrMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.union(b).groupBy("bucket").agg(sum(col("cnt")).as("cnt"))

  /** Quantiles from a sketch: for each (pct, q), the lower bound of
    * the first bucket whose cumulative count reaches ceil(q·n) — the
    * discQuantiles histogram-walk shape, over ≤ 64·k + 1 rows (the
    * single-partition window is bounded by the sketch size, not the
    * data). Relative error ≤ 1/k by the bucket-width bound. */
  def hdrQuantiles(sketch: DataFrame, qs: Seq[(String, Double)],
                   k: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sketch
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(
        Window.partitionBy().rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
    import sketch.sparkSession.implicits._
    val qdf = qs.toDF("pct", "q")
    cum.crossJoin(broadcast(qdf))
      .where(col("cum") - col("cnt") < ceil(col("q") * col("n")) &&
        ceil(col("q") * col("n")) <= col("cum"))
      .select(col("pct"), hdrBucketLow("bucket", k).as("value"))
  }
}
