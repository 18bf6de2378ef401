package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

/** Late-data accounting. A watermark silently discards rows older than
  * itself — correct streaming semantics, but at pipeline scale
  * "silently" is the operational problem: a source that replays a cold
  * partition hours late loses rows with no trace in any result. Two
  * complementary zero-cost surfaces make the loss observable:
  *
  *  - [[observed]] tags a stream with per-batch `observe` metrics
  *    (input rows + event-time span), which ride
  *    `StreamingQueryProgress.observedMetrics` — an aggregate over rows
  *    already flowing, no extra shuffle, no state.
  *  - Spark's own `stateOperators.numRowsDroppedByWatermark` counts the
  *    rows each stateful operator refused as too late;
  *    [[droppedByWatermark]] sums it from a query's retained progress,
  *    and [[Listener]] accumulates both counters past the
  *    retained-progress cap for long-running queries.
  *
  * Contract a pipeline can alert on: observed input rows = rows that
  * reached results + rows reported dropped; any other loss is a bug,
  * not a watermark.
  */
object LateData {

  /** Attach per-batch input accounting to a stream. `name` must be
    * unique within a query (two-input ops tag each side). Metric
    * columns: `input_rows`, `min_event_time`, `max_event_time`. */
  def observed(df: DataFrame, name: String,
               eventTimeCol: String = "ts"): DataFrame =
    df.observe(name,
      count(lit(1)).as("input_rows"),
      min(col(eventTimeCol)).as("min_event_time"),
      max(col(eventTimeCol)).as("max_event_time"))

  /** Rows discarded as late by ANY stateful operator of the query,
    * summed over its retained progress (capped by
    * `spark.sql.streaming.numRecentProgressUpdates`; attach a
    * [[Listener]] for totals beyond the cap). */
  def droppedByWatermark(q: StreamingQuery): Long =
    q.recentProgress.iterator
      .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum

  /** Observed input-row total for metric `name` over retained
    * progress. */
  def observedInputRows(q: StreamingQuery, name: String): Long =
    q.recentProgress.iterator.flatMap { p =>
      Option(p.observedMetrics.get(name)).map(_.getAs[Long]("input_rows"))
    }.sum

  /** Accumulating listener (register via
    * `spark.streams.addListener`): per-query totals of observed input
    * rows and watermark-dropped rows that survive the
    * retained-progress cap. Keyed by the query's stable `id` (not
    * `runId`), so totals carry across restarts from a checkpoint. */
  final class Listener extends StreamingQueryListener {
    private val drops =
      new java.util.concurrent.ConcurrentHashMap[java.util.UUID, java.lang.Long]()
    private val inputs =
      new java.util.concurrent.ConcurrentHashMap[(java.util.UUID, String), java.lang.Long]()

    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val d = p.stateOperators.map(_.numRowsDroppedByWatermark).sum
      if (d != 0) drops.merge(p.id, d, (a: java.lang.Long, b: java.lang.Long) => a + b)
      p.observedMetrics.forEach { (name, row) =>
        val n = row.getAs[Long]("input_rows")
        if (n != 0)
          inputs.merge((p.id, name), n,
            (a: java.lang.Long, b: java.lang.Long) => a + b)
      }
    }

    def dropped(q: StreamingQuery): Long =
      drops.getOrDefault(q.id, java.lang.Long.valueOf(0L)).longValue()
    def inputRows(q: StreamingQuery, name: String): Long =
      inputs.getOrDefault((q.id, name), java.lang.Long.valueOf(0L)).longValue()
  }
}
