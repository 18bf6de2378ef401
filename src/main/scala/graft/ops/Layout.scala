package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for scan
  * pruning — the write-side lever that decides how much of a 100 TB
  * table a selective query has to read.
  *
  * A table sorted on one column prunes beautifully on that column and
  * not at all on any other. Z-ordering (bit-interleaved Morton codes,
  * the Delta/Iceberg OPTIMIZE ZORDER idea) trades a little locality on
  * each dimension for locality on ALL of them: sorting by the
  * interleaved code makes every file's min/max range narrow in every
  * participating column at once, so parquet row-group stats prune
  * selective predicates on any of the z-columns.
  */
object Layout {

  /** Morton (Z-order) code: interleave the low `bits` bits of each
    * column, first column most significant within each bit level.
    * Inputs must be non-negative and < 2^bits — callers normalize
    * (rank, scale, or mod) first; the code stays in one signed 64-bit
    * long (`bits * cols.size <= 63`).
    *
    * Pure codegen'd bit arithmetic (shift/and/or unrolled per bit) —
    * no UDF, no shuffle; exactly replayable in SQL.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "need at least one column")
    require(bits > 0 && bits * cols.size <= 63,
      s"bits * cols must fit a signed long, got $bits * ${cols.size}")
    val k = cols.size
    var acc: Column = lit(0L)
    var b = 0
    while (b < bits) {
      var j = 0
      while (j < k) {
        val bit = shiftright(cols(j).cast("long"), b).bitwiseAND(lit(1L))
        acc = acc.bitwiseOR(shiftleft(bit, b * k + (k - 1 - j)))
        j += 1
      }
      b += 1
    }
    acc
  }

  /** Z-order clustering pass: range-partition by the z-value of the
    * given (normalized) columns and sort within partitions — each
    * output partition (→ file, when written) covers a contiguous
    * z-range, i.e. a small hyper-rectangle stack in the column space,
    * which is what makes per-file min/max tight on EVERY z-column.
    *
    * Scale shape: one range shuffle (sampled bounds, the same
    * machinery as a global sort) + a per-partition sort; downstream
    * writes inherit the clustering. Run it per partition/batch of a
    * huge table, not globally — z-locality is a per-file property.
    */
  def zOrder(df: DataFrame, zCols: Seq[Column], bits: Int,
             numPartitions: Int): DataFrame = {
    require(numPartitions > 0, "need at least one partition")
    val zv = zValue(zCols, bits)
    df.withColumn("__z", zv)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
