package graft.streaming

import graft.engine.KeyedTable
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming incremental near-dedup: a document stream is dedup'd micro-batch
  * by micro-batch against a PERSISTENT corpus — survivors append to the
  * corpus table and their LSH band entries merge into the index table, so
  * batch N+1 automatically dedups against everything batch N kept. The
  * corpus is never re-mined: each batch pays its own shingling plus an index
  * join (see [[Dedup.dedupAgainstIndex]]).
  *
  * Same checkpoint discipline as the CDC flow (`BookingFlow`): the stream's
  * offset log is the continuation token. Crash-replay is idempotent by
  * construction — a replayed document that already reached the corpus
  * self-matches (Jaccard 1.0) and is dropped; one that reached the corpus
  * but not the index is re-kept and re-merged, which upserts the same keys.
  */
object DedupFlow {

  /** One micro-batch: bootstrap (self-dedup) if the corpus doesn't exist
    * yet, else probe the stored index. Returns the kept rows (also
    * persisted). Exposed for batch-mode reuse and tests.
    */
  def processBatch(batch: DataFrame, idCol: String, textCol: String,
                   corpusTable: KeyedTable, indexTable: KeyedTable,
                   n: Int = 3, tau: Double = 0.5): DataFrame = {
    if (!corpusTable.exists) {
      val kept = Dedup.minhashDedup(batch, idCol, textCol, n, tau)
      corpusTable.overwrite(kept)
      indexTable.overwrite(Dedup.bandIndex(kept, idCol, textCol, n))
      kept
    } else {
      val kept = Dedup.dedupAgainstIndex(batch, idCol, textCol,
        corpusTable.current, indexTable.current, n, tau)
      corpusTable.merge(kept)
      indexTable.merge(Dedup.bandIndex(kept, idCol, textCol, n))
      kept
    }
  }

  /** Start the streaming flow over `stream` (must carry `idCol`,
    * `textCol`).
    */
  def start(stream: DataFrame, idCol: String, textCol: String,
            corpusTable: KeyedTable, indexTable: KeyedTable,
            checkpoint: String, n: Int = 3, tau: Double = 0.5): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, _: Long) =>
        processBatch(b, idCol, textCol, corpusTable, indexTable, n, tau)
        ()
      }
      .start()
}
