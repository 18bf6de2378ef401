package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * `randomSplit` depends on partitioning and row order — rerun the job
  * with different file sizes and documents silently migrate between
  * train and validation. Splitting on a content hash of the id is
  * stable across runs, partitionings, engines, and data growth (a new
  * document never moves an old one), which is what reproducible
  * training-data pipelines need. Pure codegen'd column expressions —
  * no shuffle, no UDF, and exactly reproducible in SQL.
  */
object Sample {

  /** Stable bucket in [0, buckets) from the md5 of the id's string
    * form (first 8 hex chars = 32 bits, uniform for md5). */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Assign each row a split label by hash bucket: `train` below
    * `pctTrain`, then `val` below `pctTrain + pctVal`, else `test`.
    */
  def splitLabel(id: Column, pctTrain: Int = 80, pctVal: Int = 10): Column = {
    require(pctTrain + pctVal <= 100, "split percentages exceed 100")
    val b = hashBucket(id)
    when(b < pctTrain, "train")
      .when(b < pctTrain + pctVal, "val")
      .otherwise("test")
  }

  /** The input plus a `split` column. */
  def hashSplit(df: DataFrame, idCol: String,
                pctTrain: Int = 80, pctVal: Int = 10): DataFrame =
    df.withColumn("split", splitLabel(col(idCol), pctTrain, pctVal))
}
