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
  * Hashes are md5-derived (`md5` + hex arithmetic), the same discipline
  * as [[Dedup]]'s oracle-mode token hashes and [[Similarity]]'s ±1
  * hyperplanes: ~2× slower per item than xxhash64 but every counter and
  * register is exactly reproducible by an ANSI-SQL oracle, which is
  * what lets the driver hash-compare the *sketch itself*, not just
  * derived answers.
  *
  * Scale shapes:
  *  - [[countMin]] is one narrow pass + a map-side-combined groupBy to
  *    at most depth×width rows — the shuffle carries the sketch, never
  *    the items. Estimates join the (tiny, broadcast) sketch.
  *  - [[hllRegisters]] reduces to ≤ 2^p rows the same way; union of
  *    sketches is max-per-register ([[hllMerge]]), so shard-local
  *    sketches combine without re-scanning — the property that makes
  *    HLL the standard distributed-distinct structure.
  */
object Sketch {

  /** 32-bit value from the first 8 md5 hex chars of `prefix ++ item` —
    * positive, so `%` and `pmod` agree with the SQL oracle's `%`. */
  private def h32(item: Column, prefix: String): Column =
    conv(substring(md5(concat(lit(prefix), item)), 1, 8), 16, 10).cast("long")

  /** Counter address of `item` in CM row `row`: independent hash per
    * row via a distinct md5 prefix. */
  def cmsBucket(item: Column, row: Int, width: Int): Column =
    pmod(h32(item, s"cms${row}_"), lit(width.toLong))

  /** Build a Count-Min sketch over an item column (callers tokenize /
    * project upstream). Output: (`row`, `bucket`, `cnt`) — at most
    * depth×width rows; absent rows are implicit zero counters.
    * Standard error: est ≤ true + 2N/width with prob 1−(1/2)^depth.
    */
  def countMin(items: DataFrame, itemCol: String, depth: Int = 4,
               width: Int = 256): DataFrame =
    items.select(posexplode(array((0 until depth).map(i =>
        cmsBucket(col(itemCol), i, width)): _*)).as(Seq("row", "bucket")))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))

  /** Point-frequency estimates for a probe set: est(item) = min over
    * rows of the addressed counter (never under the true count). The
    * sketch side broadcasts — probes can be arbitrarily large and
    * never shuffle. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, itemCol: String,
                  depth: Int = 4, width: Int = 256): DataFrame =
    probes.select(col(itemCol),
        posexplode(array((0 until depth).map(i =>
          cmsBucket(col(itemCol), i, width)): _*)).as(Seq("row", "bucket")))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(itemCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** HyperLogLog register frame over an item column: register = first
    * 2 md5 nibbles (p = 8, m = 256 registers, standard error
    * 1.04/√m ≈ 6.5%), rho = 1 + leading-zero bits of the next 56 bits.
    * The leading-zero count is hex-string arithmetic (zero-nibble
    * prefix length × 4 + a CASE on the first non-zero nibble) — the
    * identical expression runs in Spark and the SQL oracle, no
    * float/bit-intrinsic divergence possible. Output:
    * (`register`, `max_rho`), ≤ 256 rows.
    */
  def hllRegisters(items: DataFrame, itemCol: String): DataFrame = {
    val h = md5(col(itemCol))
    val tail = substring(h, 3, 14)
    val stripped = regexp_replace(tail, "^0+", "")
    val firstNib = substring(stripped, 1, 1)
    val nibLz = when(firstNib === "1", 3)
      .when(firstNib.isin("2", "3"), 2)
      .when(firstNib.isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    val rho = when(length(stripped) === 0, lit(57))
      .otherwise((lit(14) - length(stripped)) * 4 + nibLz + lit(1))
    items.select(conv(substring(h, 1, 2), 16, 10).cast("int").as("register"),
        rho.cast("int").as("rho"))
      .groupBy("register").agg(max(col("rho")).as("max_rho"))
  }

  /** HLL union: sketches merge by max per register — shard-local
    * sketches combine without touching the shards again. */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.union(b).groupBy("register").agg(max(col("max_rho")).as("max_rho"))

  /** The standard HLL estimator (Flajolet et al. 2007: harmonic mean +
    * small-range linear counting) over a register frame. Driver-side
    * scalar — the frame is ≤ m rows by construction. */
  def hllEstimate(registers: DataFrame, m: Int = 256): Double = {
    val regs = registers.collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val zSum = (0 until m)
      .map(j => math.pow(2.0, -regs.getOrElse(j, 0).toDouble)).sum
    val e = alpha * m * m / zSum
    val zeros = m - regs.size
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }
}
