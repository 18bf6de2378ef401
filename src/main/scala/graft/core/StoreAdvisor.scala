package graft.core

/** Codified store-choice guidance: TripleDb (struct-keyed) vs DictDb
  * (dictionary-encoded) — formerly prose in DictDb's scaladoc, now a
  * callable rule so build-once-query-many users land on the dict path
  * by default instead of re-reading docs.
  *
  * Cost model, in units of one BGP join stage over struct keys:
  *
  *  - dict encode is a ONE-TIME cost of ~`EncodeCostUnits` units
  *    (distinct-term dict build + loud collision check + id rewrite —
  *    the dictionary A/B in tools/Stress prices it at a few
  *    single-pattern passes over the store);
  *  - a query with p patterns runs p−1 join-fold stages, and the dict
  *    path roughly HALVES each (the same A/B measured ~2× on the join
  *    stage and ~70% less shuffle I/O from 8-byte keys), so each query
  *    repays (p−1)·½ units;
  *  - single-pattern queries (p = 1) never join, so they never repay
  *    anything — the dict adds decode joins for nothing.
  *
  * Dict wins when expectedQueries · (p−1) · ½ ≥ EncodeCostUnits.
  * The decode-at-the-edge cost is ignored: it scales with the RESULT
  * size, which the layout contract already requires to be small
  * relative to the store.
  */
object StoreAdvisor {

  sealed trait Choice
  case object UseTripleDb extends Choice
  case object UseDictDb extends Choice

  final case class Advice(choice: Choice, reason: String)

  /** One-time encode price in join-stage units (measured, see above). */
  val EncodeCostUnits = 3.0

  /** Advise from query shape alone: `patternCount` = typical BGP size,
    * `expectedQueries` = how many times the store will be queried
    * before it is rebuilt (1 = one-shot). */
  def choose(patternCount: Int, expectedQueries: Long): Advice = {
    require(patternCount >= 1, "a BGP has at least one pattern")
    require(expectedQueries >= 1, "a store is queried at least once")
    val joinStages = patternCount - 1
    if (joinStages == 0)
      Advice(UseTripleDb,
        "single-pattern queries never join — dict ids save nothing " +
          "and add a decode join per projected var")
    else {
      val repaid = expectedQueries * joinStages * 0.5
      if (repaid >= EncodeCostUnits)
        Advice(UseDictDb,
          f"$expectedQueries queries × $joinStages join stages repay " +
            f"$repaid%.1f units ≥ encode cost $EncodeCostUnits%.1f — " +
            "8-byte keys halve the join fold (~2× stage, −70% shuffle)")
      else
        Advice(UseTripleDb,
          f"only $repaid%.1f units repaid < encode cost " +
            f"$EncodeCostUnits%.1f — struct keys skip the dict build")
    }
  }

  /** Same rule, given the store: wraps [[choose]] and applies the
    * advice — returns a DictDb when the dict path wins, else None
    * (keep querying the TripleDb you have). */
  def encodeIfWorthIt(db: TripleDb, patternCount: Int,
                      expectedQueries: Long): Option[DictDb] =
    choose(patternCount, expectedQueries).choice match {
      case UseDictDb => Some(db.dictEncode())
      case UseTripleDb => None
    }
}
