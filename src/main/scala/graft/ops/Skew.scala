package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for shuffle joins.
  *
  * AQE's skew-join split (pinned in PlanSpec) is the first line of
  * defense, but it only helps sort-merge/shuffled-hash joins whose
  * runtime stats cross the thresholds. `saltedJoin` is the explicit
  * fallback for the cases AQE can't reach — a deliberately
  * pre-partitioned pipeline where a re-plan is unwanted, or a join
  * whose hot key is known ahead of time: the fact side's key is
  * extended with a per-row salt in [0, salts), the dimension side is
  * exploded ×salts, and the join key becomes (key, salt) — the hot
  * key's rows spread over `salts` shuffle partitions instead of
  * serializing on one task. Cost: dimension side replicated ×salts
  * (use for small-to-medium dims; a broadcastable dim needs no salting
  * at all).
  */
object Skew {

  /** Equi-join `facts ⋈ dim` on `key`, salted ×`salts`. Result equals
    * the unsalted join (bag semantics) for inner and left_outer joins.
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // any per-row value in [0, salts) works; monotonically_increasing_id
    // is cheap and avoids an RNG (deterministic within a run)
    val sf = facts.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val sd = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    sf.join(sd, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
