package graft.streaming

import graft.core.TripleDb
import org.apache.spark.sql.DataFrame

/** Streaming triple ingest (SURVEY §7.6): wide rows arriving on a
  * stream unpivot to term-struct triples with the SAME expressions as
  * the batch connector (TripleDb.fromWideTable) — the unpivot is a
  * narrow projection + explode, which Structured Streaming supports
  * unchanged.
  *
  * Incremental `index-triples`: set semantics on a stream is
  * `withWatermark + dropDuplicates` (state bounded by the watermark) —
  * downstream queries then run against the continuously-appended sink
  * exactly as against a batch TripleDb.
  */
object TripleIngest {

  /** Unpivot a (possibly streaming) wide DataFrame into triples. */
  def unpivot(stream: DataFrame, table: String, keyCol: String,
              fks: Map[String, String] = Map.empty): DataFrame =
    TripleDb.fromWideTable(stream, table, keyCol, fks).df

  /** Streaming set-semantics ingest: dedup by (s,p,o) with state
    * bounded by the watermark (`dropDuplicatesWithinWatermark`).
    * `eventTimeCol` is carried through the unpivot for the watermark
    * and dropped from the output.
    */
  def ingestDedup(stream: DataFrame, table: String, keyCol: String,
                  eventTimeCol: String, watermark: String,
                  fks: Map[String, String] = Map.empty): DataFrame =
    LateData.observed(
        TripleDb.fromWideTable(stream, table, keyCol, fks,
          keep = Seq(eventTimeCol)).df,
        "graft_input_triples", eventTimeCol)
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("s", "p", "o")
      .drop(eventTimeCol)
}
