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

  /** 32-bit value from the first 8 md5 hex chars of `c` — THE shared
    * oracle-replayable hash prefix (`CAST('0x' || substr(md5(x),1,8)
    * AS BIGINT)` on the SQL side); every md5-addressed op routes
    * through here. */
  def md5Prefix32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Stable bucket in [0, buckets) from the md5 of the id's string
    * form (first 8 hex chars = 32 bits, uniform for md5). */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    pmod(md5Prefix32(id.cast("string")), lit(buckets.toLong))

  /** Rendezvous (highest-random-weight) sharding: each id goes to the
    * shard whose per-(id, shard) hash weight is LARGEST. Unlike mod-N
    * (where changing N moves ~(N−1)/N of all ids), removing a shard
    * moves ONLY that shard's ids — every other id's argmax is
    * untouched — which is what keeps a 100 TB re-shard from rewriting
    * the whole corpus. Weight = 32-bit md5 prefix of `id#shard`; the
    * argmax (ties on higher shard index, astronomically rare but the
    * determinism contract requires a rule) runs as one loop per row
    * (TextExpressions.HrwShard) — no shuffle, no UDF, no per-row
    * struct sort, SQL-replayable.
    */
  def rendezvousShard(df: DataFrame, idCol: String,
                      shards: Int, outCol: String = "shard"): DataFrame = {
    require(shards > 0, "need at least one shard")
    require(!df.columns.contains(outCol),
      s"input already has a '$outCol' column — pass a different outCol")
    // single-loop argmax expression (TextExpressions.HrwShard): the
    // struct-array sort formulation paid O(shards·log shards) per row
    // on top of the md5s and became the bottleneck past ~256 shards
    df.withColumn(outCol,
      graft.functions.TextExpressions.hrwShard(
        col(idCol).cast("string"), shards))
  }

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

  /** Dedup-aware (leakage-safe) train/val/test split: near-duplicate
    * documents must land in the SAME split, or held-out sets leak
    * training content — the classic eval-contamination failure a plain
    * per-id [[hashSplit]] cannot prevent (two near-dups hash
    * independently). Group = connected component of the near-dup pair
    * graph ([[Components.connected]]); docs with no near-dup form their
    * own group. The split label is assigned per GROUP — the md5 bucket
    * of the group's canonical min-id label — so every member inherits
    * the same split.
    *
    * Scale shape: the pair graph covers only documents WITH a
    * near-duplicate, so the component frame is tiny relative to the
    * corpus (percent-scale even in crawl data) — the label join is a
    * broadcast-size left join, and the group hash is a pure projection.
    * Output: input columns + `grp` (group label) + `split`.
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                       srcCol: String, dstCol: String,
                       pctTrain: Int = 80, pctVal: Int = 10): DataFrame = {
    require(!df.columns.contains("grp") && !df.columns.contains("split"),
      "input already has a 'grp' or 'split' column")
    val comp = Components.connected(pairs, srcCol, dstCol)
      .withColumnRenamed("id", idCol)
    df.join(comp, Seq(idCol), "left")
      .withColumn("grp", coalesce(col("comp"), col(idCol)))
      .drop("comp")
      .withColumn("split", splitLabel(col("grp"), pctTrain, pctVal))
  }

  /** Token-budget pack assignment — the training-data step that turns a
    * corpus of variable-length documents into fixed-token-budget packs
    * (sequence-packing shards): every doc gets `(shard, pack, off)`
    * coordinates, where each pack holds `budget` tokens of contiguous
    * docs.
    *
    * Deterministic and partitioning-independent: docs are assigned to
    * one of `shards` streams by md5(id), ordered WITHIN the shard by
    * the same hash (a content-hash shuffle — stable across cluster
    * layouts, unlike `monotonically_increasing_id`), then packed by
    * exclusive running token count: `pack = excl DIV budget`,
    * `off = excl % budget` (integer arithmetic throughout, so the rule
    * replays bit-exactly in SQL). Contiguous-fill semantics: a doc may
    * straddle a pack boundary (the downstream packer splits it), which
    * is what keeps the rule a pure window function.
    *
    * Scale shape: ONE shuffle by shard, then a sort + streaming
    * running sum inside each shard — no global sort, no driver state.
    * Each shard serializes through one task, so pick shards ~ a few ×
    * cluster parallelism (e.g. 10k shards for a 100 TB corpus): the
    * per-task sort is corpus/shards rows, and pack ids are
    * per-shard, exactly like a shard-writer's output files.
    */
  def packAssignments(df: DataFrame, idCol: String, tokensCol: String,
                      budget: Long, shards: Int): DataFrame = {
    require(budget > 0, "token budget must be positive")
    require(shards > 0, "shard count must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__h", md5(col(idCol).cast("string")))
      .withColumn("shard",
        pmod(conv(substring(col("__h"), 1, 8), 16, 10).cast("long"),
          lit(shards.toLong)))
      .withColumn("__excl", sum(col(tokensCol)).over(w) - col(tokensCol))
      .withColumn("pack", expr(s"__excl DIV $budget"))
      .withColumn("off", col("__excl") % budget)
      .drop("__h", "__excl")
  }

  /** Temperature-resampled source mixture — the data-mixing step that
    * turns raw per-source corpus sizes into training shares: group g's
    * share of the output is ∝ n_g^(1/2) (square-root temperature, the
    * common flattening choice — large sources are downweighted, small
    * sources upweighted relative to natural proportions), realized as
    * deterministic per-row hash-threshold sampling. Downsampling only:
    * a group whose target exceeds its size keeps every row (no
    * duplication), like rejection-free mixture construction.
    *
    * Exactly reproducible anywhere: weights are integer sqrt
    * (floor(sqrt(n)), exact in IEEE double for n ≤ ~10^12 — far past
    * any per-source document count), thresholds are computed in
    * arbitrary-precision integers as floor(2^32·target·w_g / (Σw·n_g))
    * and compared against the 32-bit md5 prefix of the id, so the same
    * rule replays bit-for-bit in SQL (128-bit integer arithmetic) and
    * across engines — no floating-point share ever touches a keep
    * decision.
    *
    * Scale shape: ONE map-side-combined count per group (group =
    * source/domain class — a dimension-sized set; pre-bucket
    * open-ended keys first), a driver threshold table of |groups|
    * rows, then a broadcast join + narrow codegen'd filter over the
    * corpus. No corpus shuffle at all.
    */
  def temperatureMixture(df: DataFrame, groupCol: String, idCol: String,
                         targetTotal: Long): DataFrame = {
    require(targetTotal > 0, "target size must be positive")
    val spark = df.sparkSession
    def isqrt(n: Long): Long = {
      var x = math.sqrt(n.toDouble).toLong
      while ((x + 1) * (x + 1) <= n) x += 1
      while (x * x > n) x -= 1
      x
    }
    // one row per group — dimension-sized by contract (see scaladoc)
    val counts = df.groupBy(col(groupCol)).count().collect()
      .map(r => (r.get(0), r.getLong(1)))
    val cap = BigInt(1) << 32
    val sumW = counts.map { case (_, n) => BigInt(isqrt(n)) }.sum
    val rows = counts.map { case (g, n) =>
      val thr = (cap * BigInt(targetTotal) * BigInt(isqrt(n))) /
        (sumW * BigInt(n))
      org.apache.spark.sql.Row(g, thr.min(cap).toLong)
    }
    val thrDf = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__g",
          df.schema(groupCol).dataType),
        org.apache.spark.sql.types.StructField("__thr",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val h32 = md5Prefix32(col(idCol).cast("string"))
    df.join(broadcast(thrDf), col(groupCol) === col("__g"))
      .where(h32 < col("__thr"))
      .drop("__g", "__thr")
  }

  /** Deterministic stratified sample: the k rows per group that sort
    * first by md5(id) — a content-hash shuffle, so the sample is stable
    * across runs/partitionings AND uniformly random-like within each
    * group (unlike "first k by id", which biases toward old rows).
    *
    * Scale shape: one shuffle by group + a streaming row_number per
    * group partition. Exact per-group top-k serializes each group
    * through one task — fine for curation-sized k and group counts;
    * for billions-per-group pre-filter with [[hashBucket]] first
    * (hash < k·buckets/|group| keeps ~k candidates, then exact top-k).
    */
  def stratifiedSample(df: DataFrame, groupCol: String, idCol: String,
                       k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /** k-anonymity-style suppression: drop every row whose
    * quasi-identifier combination appears in fewer than `k` rows — the
    * release-time privacy guard complementing the store tier's
    * tombstone deletes (a rare (user, attribute…) combination
    * re-identifies even with ids stripped; suppressing small groups is
    * the baseline k-anonymity mechanism).
    *
    * Scale shape: one map-side-combined groupBy over the
    * quasi-identifier columns to find the rare combinations, then a
    * join back. The rare-key set is NOT assumed small (at web scale
    * the long tail usually IS most distinct keys), so this is a plain
    * shuffle join on the quasi-identifier — AQE picks broadcast when
    * the rare set happens to be tiny, and the skew split covers hot
    * keys. No window over the full table: the count aggregate combines
    * map-side, where a `count(*) over (partition by …)` would carry
    * every row through one shuffle ungrouped.
    */
  def suppressSmallGroups(df: DataFrame, quasiCols: Seq[String],
                          k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, "k must be at least 1")
    val keep = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__gc"))
      .where(col("__gc") >= k)
      .drop("__gc")
    df.join(keep, quasiCols, "left_semi")
  }

  /** l-diversity suppression (Machanavajjhala et al., ICDE 2006):
    * k-anonymity's complement — a quasi-identifier group where every
    * row shares ONE sensitive value re-identifies the attribute even
    * when the group is large, so groups with fewer than `l` DISTINCT
    * sensitive values are suppressed. Same scale shape as
    * [[suppressSmallGroups]]: `count(distinct)` goes through Spark's
    * two-phase partial aggregation (dedup map-side on (quasi,
    * sensitive), then count per quasi) — no window, no all-rows-
    * through-one-shuffle, and the semi join back is AQE-planned.
    */
  def suppressLowDiversityGroups(df: DataFrame, quasiCols: Seq[String],
                                 sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 1, "l must be at least 1")
    val keep = df.groupBy(quasiCols.map(col): _*)
      .agg(countDistinct(col(sensitiveCol)).as("__ld"))
      .where(col("__ld") >= l)
      .drop("__ld")
    df.join(keep, quasiCols, "left_semi")
  }
}
