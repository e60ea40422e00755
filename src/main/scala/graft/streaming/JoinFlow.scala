package graft.streaming

import graft.engine.{JoinDelta, KeyedTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintained join view — one MULTIPLEXED change stream keeps a
  * fact⋈dim view (and its join index) current through
  * [[JoinDelta.maintain]], micro-batch by micro-batch. The stream carries
  * both tables' events on a superset schema with a `sideCol` discriminator
  * (`fact` / `dim`), the way a single consumer sees a multi-table CDC
  * firehose; each epoch splits the batch and applies BOTH sides under one
  * batch id, so the view never observes a fact epoch without its
  * same-epoch dim companion.
  *
  * Delivery semantics, composed like [[CdcFlow]]'s: the checkpoint gives
  * at-least-once epochs, and every step of [[JoinDelta.maintain]] is
  * replay-idempotent against applied state (mergeCdc upserts/tombstones,
  * index pair replacement, view recompute-from-current) — so redelivery is
  * safe even without the tags, and the per-table version tags additionally
  * let a crash-interrupted epoch SKIP the tables it already committed
  * (fact applied, view not → resume completes index + view only).
  */
object JoinFlow {

  /** Apply one epoch. Exposed for batch-mode reuse and tests. */
  def processBatch(factTable: KeyedTable, dimTable: KeyedTable,
                   view: KeyedTable, index: KeyedTable, batch: DataFrame,
                   epochId: Long, dimRef: String, dimKey: String,
                   factCols: Seq[String], dimCols: Seq[String],
                   joinType: String = "inner", sideCol: String = "_side",
                   opCol: String = "_op", seqCol: String = "_seq",
                   oldPrefix: String = "_old_", tagPrefix: String = ""): Unit = {
    val meta = Seq(opCol, seqCol)
    val fd = batch.filter(col(sideCol) === "fact")
      .select((factCols ++ Seq(oldPrefix + dimRef) ++ meta).map(col).toIndexedSeq: _*)
    val dd = batch.filter(col(sideCol) === "dim")
      .select((dimCols ++ meta).map(col).toIndexedSeq: _*)
    // absent sides pass as None: an all-fact epoch must not pay (or
    // version-churn) an empty dim apply — isEmpty is an action, but on the
    // delta-sized batch, not state
    JoinDelta.maintain(factTable, dimTable, view, index,
      Option(fd).filterNot(_.isEmpty), Option(dd).filterNot(_.isEmpty),
      dimRef, dimKey, batchId = FlowTags.tag(tagPrefix, epochId),
      joinType = joinType, opCol = opCol, seqCol = seqCol, oldPrefix = oldPrefix)
    ()
  }

  /** Start the flow over `stream` — a superset-schema frame carrying
    * `sideCol`, the fact columns + `oldPrefix+dimRef`, the dim columns, and
    * `opCol`/`seqCol` (columns of the other side null on each row).
    * All four tables must be bootstrapped ([[JoinDelta.bootstrap]]) first.
    */
  def start(stream: DataFrame, factTable: KeyedTable, dimTable: KeyedTable,
            view: KeyedTable, index: KeyedTable, checkpoint: String,
            dimRef: String, dimKey: String, factCols: Seq[String],
            dimCols: Seq[String], joinType: String = "inner",
            sideCol: String = "_side", opCol: String = "_op",
            seqCol: String = "_seq", oldPrefix: String = "_old_"): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, epochId: Long) =>
        processBatch(factTable, dimTable, view, index, b, epochId, dimRef,
          dimKey, factCols, dimCols, joinType, sideCol, opCol, seqCol,
          oldPrefix, tagPrefix = FlowTags.prefix(checkpoint))
        ()
      }
      .start()
}
