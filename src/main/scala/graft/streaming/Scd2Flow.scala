package graft.streaming

import graft.engine.{KeyedTable, Scd2}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming SCD-2 history maintenance — an op-coded CDC stream keeps a
  * type-2 history table current through [[Scd2.maintain]], micro-batch by
  * micro-batch: the history-PRESERVING twin of [[CdcFlow]].
  *
  * Unlike [[CdcFlow]], the apply is NOT replay-idempotent: re-applying a
  * batch would re-close the rows it already closed at sequences the
  * monotonicity guard now rejects — by design, an out-of-order event is
  * corruption, and a naive replay looks exactly like one. So this flow
  * REQUIRES the epoch-id tag guard ([[AggFlow]]'s pattern): a redelivered
  * epoch whose id matches the table's version tag no-ops before the guard
  * can fire, which is precisely the foreachBatch-retry window.
  */
object Scd2Flow {

  /** Apply one epoch. Exposed for batch-mode reuse and tests. */
  def processBatch(hist: KeyedTable, batch: DataFrame, epochId: Long,
                   opCol: String = "_op", seqCol: String = "_seq",
                   tagPrefix: String = ""): Long =
    Scd2.maintain(hist, batch, opCol, seqCol,
      batchId = Some(FlowTags.tag(tagPrefix, epochId)))

  /** Start applying `stream` (the history's payload columns + `opCol` +
    * `seqCol`) to `hist`, which must be bootstrapped ([[Scd2.bootstrap]])
    * first — the monotonicity contract needs a recorded boundary to guard
    * against, so there is no empty-state auto-bootstrap here.
    */
  def start(stream: DataFrame, hist: KeyedTable, checkpoint: String,
            opCol: String = "_op", seqCol: String = "_seq"): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, epochId: Long) =>
        processBatch(hist, b, epochId, opCol, seqCol,
          tagPrefix = FlowTags.prefix(checkpoint))
        ()
      }
      .start()
}
