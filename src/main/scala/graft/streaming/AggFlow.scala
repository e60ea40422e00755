package graft.streaming

import graft.engine.{AggDelta, KeyedTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming incremental aggregate maintenance — a CDC stream of
  * before/after-image events keeps a stored aggregate table current through
  * [[AggDelta.maintain]], micro-batch by micro-batch. The continuously
  * maintained materialized view: refresh cost per batch is ∝ batch, the
  * fact stream is never re-read, and the state table is a queryable
  * KeyedTable snapshot at every commit.
  *
  * Exactly-once across foreachBatch retries comes from composing the two
  * layers' guarantees: the streaming engine redelivers a crashed epoch with
  * the SAME epoch id, and [[AggDelta.maintain]] stamps each applied batch's
  * id into the state table's version tag atomically with the commit
  * ([[KeyedTable.lastTag]]) — a redelivered epoch whose tag already shows no-ops
  * instead of double-counting. This is the guard increments need that the
  * dedup flows get for free from idempotent upserts.
  *
  * First batch auto-bootstraps empty state (a CDC stream opening mid-feed
  * with U/D events for unseen groups will fail the below-zero retraction
  * check loudly — seed the table with [[AggDelta.bootstrap]] from a fact
  * snapshot first for that case).
  */
object AggFlow {

  /** Apply one epoch. Exposed for batch-mode reuse and tests. */
  def processBatch(agg: KeyedTable, cdc: DataFrame, groups: Seq[String],
                   measures: Seq[String], epochId: Long,
                   opCol: String = "_op", oldPrefix: String = "_old_",
                   valueType: String = "decimal(18,2)",
                   accType: String = "decimal(28,2)",
                   tagPrefix: String = ""): Long = {
    if (!agg.exists)
      AggDelta.bootstrap(agg,
        cdc.select((groups ++ measures).map(col).toIndexedSeq: _*).limit(0),
        groups, measures, valueType, accType)
    AggDelta.maintain(agg, cdc, groups, measures, opCol, oldPrefix,
      valueType, accType, batchId = Some(FlowTags.tag(tagPrefix, epochId)))
  }

  /** Start the maintenance flow over `stream` (must carry the group/measure
    * columns, their `oldPrefix` twins, and `opCol`).
    */
  def start(stream: DataFrame, agg: KeyedTable, groups: Seq[String],
            measures: Seq[String], checkpoint: String,
            opCol: String = "_op", oldPrefix: String = "_old_",
            valueType: String = "decimal(18,2)",
            accType: String = "decimal(28,2)"): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, epochId: Long) =>
        processBatch(agg, b, groups, measures, epochId, opCol, oldPrefix,
          valueType, accType, tagPrefix = FlowTags.prefix(checkpoint))
        ()
      }
      .start()
}
