package graft.streaming

import graft.engine.{KeyedTable, TopKDelta}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintained top-k — a CDC stream keeps both the fact table and
  * a [[TopKDelta]] leaderboard current, micro-batch by micro-batch. The
  * fact table rides along because the leaderboard's REFILL path needs
  * post-apply fact state to re-derive a group whose buffered guarantee ran
  * out — the stream itself is gone by then, so the facts must persist
  * beside the answer they back.
  *
  * Exactly-once via the epoch-id version tag on BOTH tables ([[AggFlow]]'s
  * pattern — a redelivered top-k apply is NOT idempotent: re-added inserts
  * would duplicate buffer rows), and the two applies under one epoch id
  * make the pair crash-resumable the [[JoinFlow]] way: fact applied but
  * state not → the resume skips the fact table and completes the state.
  */
object TopKFlow {

  /** Apply one epoch. Exposed for batch-mode reuse and tests.
    * `factsReplica` threads [[TopKDelta.maintain]]'s group-keyed replica
    * (r10): the replica is maintained inside the same tagged apply, so a
    * refill in any micro-batch bucket-prunes instead of scanning the fact
    * table — the streaming cadence is exactly where the refill cliff hurts
    * most (a delete-heavy burst triggers it repeatedly).
    */
  def processBatch(factTable: KeyedTable, state: KeyedTable, batch: DataFrame,
                   epochId: Long, groups: Seq[String], idCols: Seq[String],
                   scoreCol: String, k: Int, bufferFactor: Int = 2,
                   opCol: String = "_op", seqCol: String = "_seq",
                   oldPrefix: String = "_old_", tagPrefix: String = "",
                   factsReplica: Option[KeyedTable] = None): Long = {
    val tag = FlowTags.tag(tagPrefix, epochId)
    if (!factTable.lastTag.contains(tag))
      factTable.mergeCdc(batch, opCol, seqCol, Some(tag))
    TopKDelta.maintain(state, batch, factTable.current, groups, idCols,
      scoreCol, k, bufferFactor, opCol, oldPrefix, batchId = Some(tag),
      factsReplica = factsReplica)
  }

  /** Start the flow over `stream` (fact columns + `oldPrefix` group images
    * + `opCol`/`seqCol`). Both tables must be bootstrapped first
    * ([[TopKDelta.bootstrap]] for the state, a fact snapshot for the table).
    */
  def start(stream: DataFrame, factTable: KeyedTable, state: KeyedTable,
            checkpoint: String, groups: Seq[String], idCols: Seq[String],
            scoreCol: String, k: Int, bufferFactor: Int = 2,
            opCol: String = "_op", seqCol: String = "_seq",
            oldPrefix: String = "_old_",
            factsReplica: Option[KeyedTable] = None): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, epochId: Long) =>
        processBatch(factTable, state, b, epochId, groups, idCols, scoreCol,
          k, bufferFactor, opCol, seqCol, oldPrefix,
          tagPrefix = FlowTags.prefix(checkpoint),
          factsReplica = factsReplica)
        ()
      }
      .start()
}
