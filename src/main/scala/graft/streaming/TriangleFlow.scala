package graft.streaming

import graft.engine.KeyedTable
import graft.operators.Graph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintained triangle counts — an edge CDC stream (a, b, _op
  * with I/D) keeps the stored edge set and per-node triangle counts current
  * through [[Graph.triangleMaintain]], micro-batch by micro-batch: the
  * graph member of the maintained-state flow family.
  *
  * Delivery semantics follow [[AggFlow]]'s, not [[CdcFlow]]'s: the count
  * increments are NOT replay-idempotent (re-applying an epoch would move
  * counts twice), so every epoch applies under a checkpoint-scoped version
  * tag ([[FlowTags]]) — redelivered epochs no-op per table, and a crash
  * between the counts commit and the edges commit resumes by skipping the
  * table already tagged (counts first, edges last, the order
  * [[Graph.triangleMaintain]] fixes).
  */
object TriangleFlow {

  /** Apply one epoch. Exposed for batch-mode reuse and tests. */
  def processBatch(edgesT: KeyedTable, countsT: KeyedTable, batch: DataFrame,
                   epochId: Long, aCol: String = "a", bCol: String = "b",
                   opCol: String = "_op", tagPrefix: String = ""): Unit = {
    Graph.triangleMaintain(edgesT, countsT, batch, aCol, bCol, opCol,
      batchId = Some(FlowTags.tag(tagPrefix, epochId)))
    ()
  }

  def start(stream: DataFrame, edgesT: KeyedTable, countsT: KeyedTable,
            checkpoint: String, aCol: String = "a", bCol: String = "b",
            opCol: String = "_op"): StreamingQuery = {
    val prefix = FlowTags.prefix(checkpoint)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, epoch: Long) =>
        processBatch(edgesT, countsT, b, epoch, aCol, bCol, opCol, prefix)
      }
      .start()
  }
}
