package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event analytics over the `events` table, written once and usable
  * both batch and streaming (the transforms are identical DataFrame
  * programs; Structured Streaming just changes the source/sink).
  *
  * Scale notes: hourly aggregation is a single hash-partitioned
  * groupBy with map-side combine; sessionization is one shuffle by
  * user (window function in batch, mapGroupsWithState in streaming —
  * state is per-user O(1)).
  */
object Events {

  /** Normalize the event timestamp to integer microseconds (`tus`),
    * whichever way the fixture stored it: TIMESTAMP(NANOS) read as a
    * raw long (`spark.sql.legacy.parquet.nanosAsLong`; integer `div`
    * keeps full precision — nanos exceed 2^53, so any double detour
    * would corrupt them) or a native timestamp[us] column (current
    * driver fixtures). Every consumer of event time goes through here;
    * never touch `ts` raw.
    */
  def withTsUs(events: DataFrame): DataFrame =
    events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        events.withColumn("tus", expr("ts div 1000"))
      case _ =>
        events.withColumn("tus", unix_micros(col("ts").cast("timestamp")))
    }

  /** Tumbling hourly counts/sums per event type. Money is summed in
    * integer cents (exact, oracle-reproducible). Batch shape; the same
    * aggregation streams with `hourlyCountsStream`.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    withTsUs(events).groupBy(
        date_format(date_trunc("hour", timestamp_micros(col("tus"))),
          "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))

  /** Streaming variant: watermark + windowed aggregation. Input is
    * tagged with [[LateData.observed]] metrics, and rows older than
    * the watermark are counted in the query's
    * `numRowsDroppedByWatermark` — late data is dropped (the
    * watermark contract) but never silently (see [[LateData]]). */
  def hourlyCountsStream(events: DataFrame): DataFrame =
    LateData.observed(events, "graft_input_events")
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n_events"), col("sum_cents"))

  /** Sliding-window counts: each event lands in size/slide overlapping
    * windows (1h/15m → 4). Same epoch-aligned window arithmetic batch
    * and streaming; the SQL oracle replays it with integer microsecond
    * floor division.
    */
  def slidingCounts(events: DataFrame, size: String = "1 hour",
                    slide: String = "15 minutes"): DataFrame =
    withTsUs(events)
      .groupBy(window(timestamp_micros(col("tus")), size, slide),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n_events"))

  /** Batch sessionization: sessions split on gaps > `gapMinutes`.
    * Per user: number of sessions and events. Timestamps compare in
    * integer microseconds (exact).
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    withTsUs(events)
      .select(col("user_id"), col("event_id"), col("tus"))
      .withColumn("prev", lag(col("tus"), 1).over(w))
      .withColumn("new_session",
        when(col("prev").isNull || col("tus") - col("prev") > gapUs, 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
  }

  /** Streaming session windows via Spark's native gap-based
    * `session_window`: one state entry per open session, merged on the
    * fly; emits (user, session start/end, n_events) on watermark
    * close. Same session split as [[sessionize]]'s gap rule.
    */
  def sessionWindowsStream(events: DataFrame, gapMinutes: Int = 30,
                           watermark: String = "2 hours"): DataFrame =
    LateData.observed(events, "graft_input_events")
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("start"),
        col("n_events"))

  /** Stream-stream interval join: each purchase matched to same-user
    * clicks within (purchase_ts − tolerance, purchase_ts]. Both sides
    * watermarked, and the time bound sits in the join condition — that
    * is what lets Structured Streaming evict click state older than
    * watermark + interval instead of buffering the stream forever (the
    * canonical bounded-state stream-stream join). The same program
    * runs batch (watermarks are no-ops there).
    *
    * Inputs need columns (user_id, event_id, ts); output one row per
    * qualifying (purchase, click) pair.
    */
  def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame,
                        toleranceMinutes: Int = 10,
                        watermark: String = "2 hours"): DataFrame = {
    val p = LateData.observed(purchases
        .select(col("user_id"), col("event_id").as("p_id"),
          col("ts").as("p_ts")),
        "graft_input_purchases", "p_ts")
      .withWatermark("p_ts", watermark)
    val c = LateData.observed(clicks
        .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
          col("ts").as("c_ts")),
        "graft_input_clicks", "c_ts")
      .withWatermark("c_ts", watermark)
    p.join(c, expr(
        s"""user_id = c_user AND
           |c_ts BETWEEN p_ts - INTERVAL $toleranceMinutes MINUTES AND p_ts
           |""".stripMargin.replace('\n', ' ')))
      .select(col("p_id").as("event_id"), col("c_id").as("click_id"))
  }

  case class SessionState(lastTs: Long, nSessions: Long, nEvents: Long)
  case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** Streaming sessionization via mapGroupsWithState: per-user state is
    * three longs regardless of history length. (Batch-callable too for
    * testing; events must arrive time-ordered per user within a batch.)
    */
  def sessionizeStream(events: Dataset[(Long, Long, Long)], // (user_id, event_id, tus)
                       gapMinutes: Int = 30): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events.groupByKey(_._1)
      .mapGroupsWithState[SessionState, UserSessions](GroupStateTimeout.NoTimeout) {
        (user, it, state: GroupState[SessionState]) =>
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          it.toSeq.sortBy(e => (e._3, e._2)).foreach { e =>
            val newSession = st.lastTs == Long.MinValue || e._3 - st.lastTs > gapUs
            st = SessionState(e._3,
              st.nSessions + (if (newSession) 1 else 0), st.nEvents + 1)
          }
          state.update(st)
          UserSessions(user, st.nSessions, st.nEvents)
      }
  }
}
