package graft.streaming

import graft.engine.KeyedTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming op-coded CDC apply — a change stream carrying I/U/D events
  * keeps a KeyedTable current through [[KeyedTable.mergeCdc]], micro-batch
  * by micro-batch: the tombstone-capable twin of [[graft.engine.BookingFlow]]'s
  * upsert-only shell (the reference feed never deletes; general CDC feeds
  * do).
  *
  * Delivery semantics: the streaming checkpoint gives at-least-once epochs,
  * and mergeCdc is replay-IDEMPOTENT (re-applying a batch reproduces the
  * same snapshot — upserts overwrite equal rows, tombstones of absent keys
  * no-op), so the composition is effectively exactly-once without any tag
  * bookkeeping. That is exactly why [[AggFlow]] — whose increments are NOT
  * idempotent — needs the version-tag guard and this flow doesn't.
  */
object CdcFlow {

  /** Start applying `stream` (must carry the table's columns + `opCol` +
    * `seqCol`) to `table`.
    */
  def start(stream: DataFrame, table: KeyedTable, checkpoint: String,
            opCol: String = "_op", seqCol: String = "_seq"): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, _: Long) =>
        table.mergeCdc(b, opCol, seqCol)
        ()
      }
      .start()
}
