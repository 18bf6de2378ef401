package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared tombstone + partition-pruned-compaction machinery for the
  * durable stores ([[TripleDb]], [[DictDb]]) — the same GDPR contract
  * the near-dup / IVF-PQ indexes already carry: a delete appends a tiny
  * tombstone file set (nothing in the store is rewritten), loads mask
  * tombstoned rows, and compaction physically rewrites ONLY the parquet
  * files that hold at least one deleted row. Untouched partition
  * directories — and untouched files inside affected partitions — are
  * never read-modified-written, so at 100 TB a takedown costs the
  * affected tenant's files, not the corpus.
  *
  * The tombstone set lives in an underscore-prefixed subdir of the
  * store root, invisible to parquet partition discovery, so raw reads
  * of the store directory are unaffected.
  */
private[graft] object Tombstones {
  val Dir = "_tombstones"
  def tombPath(store: String): String = s"$store/$Dir"

  def exist(spark: SparkSession, store: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(tombPath(store))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Append tombstone rows (whatever key columns the store joins on,
    * plus its partition column for pruned compaction). */
  def append(rows: DataFrame, store: String): Unit =
    rows.write.mode("append").parquet(tombPath(store))

  /** The store's rows minus tombstoned ones — a broadcast-able
    * left_anti on the key columns when tombstones exist, the identity
    * otherwise. */
  def mask(spark: SparkSession, store: String, df: DataFrame,
           keyCols: Seq[String]): DataFrame =
    if (exist(spark, store))
      df.join(spark.read.parquet(tombPath(store))
        .select(keyCols.map(col): _*), keyCols, "left_anti")
    else df

  /** Physically drop tombstoned rows from a `partitionBy(partCol)`
    * store. Partition-pruned: only partitions named in the tombstones
    * are even scanned to find affected files, and only files holding a
    * deleted row are rewritten (staging-then-swap, same discipline as
    * the index compactors). Clears the tombstone set at the end.
    */
  def compactPartitioned(spark: SparkSession, store: String,
                         keyCols: Seq[String], partCol: String): Unit = {
    if (!exist(spark, store)) return
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(store).getFileSystem(hconf)
    val tomb = spark.read.parquet(tombPath(store))
    // bounded by the store's partition count (predicates / pred ids)
    val parts = tomb.select(partCol).distinct().collect().map(_.get(0))
    val keys = tomb.select(keyCols.map(col): _*)
    // file list bounded by the AFFECTED partitions' file count
    val affected = spark.read.parquet(store)
      .where(col(partCol).isin(parts.toIndexedSeq: _*))
      .withColumn("_f", input_file_name())
      .join(keys, keyCols).select("_f").distinct()
      .collect().map(_.getString(0))
    if (affected.nonEmpty) {
      val staging = s"$store/_compact_staging"
      val basePath = fs.makeQualified(
        new org.apache.hadoop.fs.Path(store)).toString
      spark.read.option("basePath", basePath).parquet(affected.toIndexedSeq: _*)
        .join(keys, keyCols, "left_anti")
        .write.mode("overwrite").partitionBy(partCol).parquet(staging)
      affected.foreach(f =>
        fs.delete(new org.apache.hadoop.fs.Path(new java.net.URI(f)), false))
      val stagingPath = new org.apache.hadoop.fs.Path(staging)
      fs.listStatus(stagingPath).foreach { d =>
        if (d.isDirectory && d.getPath.getName.startsWith(partCol + "=")) {
          val dest = new org.apache.hadoop.fs.Path(store, d.getPath.getName)
          fs.mkdirs(dest)
          fs.listStatus(d.getPath).foreach { st =>
            if (st.getPath.getName.endsWith(".parquet"))
              fs.rename(st.getPath,
                new org.apache.hadoop.fs.Path(dest, st.getPath.getName))
          }
        }
      }
      fs.delete(stagingPath, true)
    }
    fs.delete(new org.apache.hadoop.fs.Path(tombPath(store)), true)
    // files were replaced in place — drop cached listings so open
    // sessions re-list instead of chasing deleted part files
    spark.catalog.refreshByPath(store)
    spark.catalog.refreshByPath(tombPath(store))
  }
}
