package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: match each left row to the right row with the greatest
  * timestamp ≤ the left row's timestamp, per key.
  *
  * Implementation is the union + carry-forward pattern: tag both
  * sides, sort per key by (ts, side, tie), and carry the last right
  * payload forward with `last(..., ignoreNulls)` over an unbounded
  * preceding window. One shuffle (by key), no range-join row
  * explosion — the classic scalable shape for "latest value as of
  * time t" at any data size. Ties (equal ts) see the right row
  * (right sorts before left), and among equal right timestamps the
  * largest tie-break wins. Semantics are deterministic and exactly
  * reproducible in window SQL for the oracle.
  */
object AsOf {

  /** @param left       rows to enrich
    * @param right      rows providing the as-of payload
    * @param keyCols    equi-join key
    * @param tsCol      ordering column name (present in both sides)
    * @param tieCol     deterministic tie-break column (both sides)
    * @param payloadCol right column carried to the output (as `asof_<payloadCol>`)
    * @param tolerance  max allowed `left.ts − right.ts` (same units as
    *                   `tsCol`); a match farther back yields NULL.
    *                   Default unbounded — the plan is unchanged from
    *                   the tolerance-free join (no extra columns).
    */
  def join(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           tsCol: String, tieCol: String, payloadCol: String,
           tolerance: Long = Long.MaxValue): DataFrame = {
    val bounded = tolerance != Long.MaxValue
    val keep = keyCols ++ Seq(tsCol, tieCol)
    val l = left.withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(right.schema(payloadCol).dataType))
    val r0 = right.select((keep.map(col) :+ col(payloadCol).as("__payload")): _*)
      .withColumn("__side", lit(0))
    // carry the matched right row's timestamp alongside the payload so
    // the tolerance test is one arithmetic comparison after the window
    val r = if (bounded) r0.withColumn("__pts", col(tsCol)) else r0
    val lCols = left.columns
    val unioned = l.select((keep ++ Seq("__side", "__payload")).map(col) ++
        lCols.filterNot(keep.contains).filterNot(Set("__side", "__payload"))
          .map(col): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__side"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn(s"asof_$payloadCol", last(col("__payload"), ignoreNulls = true).over(w))
    val gated =
      if (bounded)
        carried
          .withColumn("__apts", last(col("__pts"), ignoreNulls = true).over(w))
          .withColumn(s"asof_$payloadCol",
            when(col("__apts").isNotNull &&
              col(tsCol) - col("__apts") <= tolerance, col(s"asof_$payloadCol")))
          .drop("__pts", "__apts")
      else carried
    gated
      .where(col("__side") === 1)
      .drop("__side", "__payload")
  }

  /** Log compaction: collapse a changelog to its latest-state snapshot
    * — one row per key, the row with the greatest (ts, tie). The
    * CDC/upsert-materialization step: replaying a 100 TB event log
    * into a current-state table is exactly this.
    *
    * Scale shape: ONE shuffle by key + a streaming row_number per key
    * partition (no global sort, no driver state). The tie-break column
    * makes the winner deterministic under equal timestamps, so the
    * snapshot is bit-stable across runs and engines.
    */
  def compactLatest(log: DataFrame, keyCols: Seq[String],
                    tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    log.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }
}
