package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join: pairs within ±delta on a numeric column, with an
  * optional equi-key.
  *
  * Implementation buckets both sides by floor(value/delta); a pair
  * within delta must land in the same or adjacent buckets, so the left
  * side explodes to 3 candidate buckets and the join is a plain
  * equi-join on (key, bucket) — shuffled, never cross-product. The
  * exact |a−b| ≤ delta filter runs on candidates only. This is the
  * standard O(matches) shape for interval joins at scale; a naive
  * theta-join would be a broadcast-nested-loop over the whole input.
  */
object RangeJoin {

  /** Pairs (a, b) with a.key = b.key, |a.val − b.val| ≤ delta, and
    * a.id < b.id. Values must be integral (exact arithmetic).
    */
  def bandPairs(df: DataFrame, idCol: String, keyCol: String, valCol: String,
                delta: Long): DataFrame = {
    require(delta > 0, "delta must be positive")
    val bucket = floor(col(valCol) / delta)
    val right = df.select(col(idCol).as("ib"), col(keyCol).as("kb"),
      col(valCol).as("vb"), bucket.cast("long").as("bucket"))
    val left = df.select(col(idCol).as("ia"), col(keyCol).as("ka"),
        col(valCol).as("va"), bucket.cast("long").as("b0"))
      .select(col("ia"), col("ka"), col("va"),
        explode(array(col("b0") - 1, col("b0"), col("b0") + 1)).as("bucket"))
    left.join(right, Seq("bucket"))
      .where(col("ka") === col("kb"))
      .where(col("ia") < col("ib"))
      .where(abs(col("va") - col("vb")) <= delta)
      .select(col("ia"), col("ib"))
      .dropDuplicates("ia", "ib")
  }
}
