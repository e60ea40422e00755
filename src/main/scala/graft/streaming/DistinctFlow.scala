package graft.streaming

import graft.engine.{DistinctState, KeyedTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming incremental distinct-count maintenance — the insert-monotone
  * member of the maintained-view flow family: an append stream of
  * (group, value) rows keeps the per-group HLL state table current
  * through [[DistinctState.maintain]], so `distinct_est` reads stay
  * O(groups) while the stream is never re-read.
  *
  * Exactly-once is tag-guarded like [[AggFlow]] — mandatory here for
  * EXACT invariance, not just cost: re-unioning a sketch is SET-wise a
  * no-op but not bit-invariant (the union can shift the sketch's internal
  * representation and nudge the estimate — measured in
  * DistinctStateSpec), so a redelivered epoch must not touch the state
  * at all. Insert-only contract: deletes cannot shrink a sketch — feeds
  * with retractions belong on the exact re-derivation path instead
  * (DistinctState's scaladoc).
  */
object DistinctFlow {

  /** Apply one epoch. Exposed for batch-mode reuse and tests. */
  def processBatch(state: KeyedTable, batch: DataFrame, groups: Seq[String],
                   valueCol: String, epochId: Long, lgK: Int = 12,
                   tagPrefix: String = ""): Long = {
    if (!state.exists)
      DistinctState.bootstrap(state, batch.limit(0), groups, valueCol, lgK)
    DistinctState.maintain(state, batch, groups, valueCol, lgK,
      batchId = Some(FlowTags.tag(tagPrefix, epochId)))
  }

  /** Start the maintenance flow over `stream` (must carry the group
    * columns and `valueCol`; rows are inserts by contract).
    */
  def start(stream: DataFrame, state: KeyedTable, groups: Seq[String],
            valueCol: String, checkpoint: String, lgK: Int = 12): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, epochId: Long) =>
        processBatch(state, b, groups, valueCol, epochId, lgK,
          tagPrefix = FlowTags.prefix(checkpoint))
        ()
      }
      .start()
}
