package graft.streaming

import graft.engine.KeyedTable
import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming incremental EMBEDDING dedup — the vector twin of [[DedupFlow]]:
  * a vector stream is dedup'd micro-batch by micro-batch against a
  * persistent corpus via its stored sign-bucket index
  * ([[Similarity.signBucketIndex]]). Survivors append to the corpus table
  * and their bucket rows merge into the index table, so batch N+1
  * automatically dedups against everything batch N kept; the corpus is
  * never re-hashed — each batch pays its own signatures plus an index
  * equi-join plus |collisions| exact kernel dots
  * ([[Similarity.dedupAgainstSignIndex]]).
  *
  * Drop rule everywhere (bootstrap included): corpus wins, and within a
  * batch the LARGER id of a verified pair drops — the same rule
  * [[graft.operators.Dedup.dedupAgainstIndex]] and its oracle state, so the
  * batch-mode twin is SQL-expressible (`q_embed_inc_dedup`).
  *
  * Checkpoint discipline as in [[DedupFlow]]: the stream's offset log is the
  * continuation token, and crash-replay is idempotent by construction — a
  * replayed vector that already reached the corpus self-matches (cosine 1)
  * and is dropped; one that reached the corpus but not the index is re-kept
  * and re-merged, which upserts the same keys.
  */
object VectorDedupFlow {

  /** One micro-batch: bootstrap (self-dedup via [[Similarity.lshPairs]],
    * larger id drops) if the corpus doesn't exist yet, else probe the
    * stored index. Returns the kept rows (also persisted). Exposed for
    * batch-mode reuse and tests.
    */
  def processBatch(batch: DataFrame, idCol: String, vecCol: String,
                   corpusTable: KeyedTable, indexTable: KeyedTable,
                   tau: Double, dim: Int,
                   bits: Int = 16, tables: Int = 8): DataFrame = {
    if (!corpusTable.exists) {
      val pairs = Similarity.lshPairs(batch, idCol, vecCol, tau, dim, bits, tables)
      val kept = batch.join(pairs.select(col("id_b").as("__drop_id")).distinct(),
        batch(idCol).cast("long") === col("__drop_id"), "left_anti")
      corpusTable.overwrite(kept)
      indexTable.overwrite(Similarity.signBucketIndex(kept, idCol, vecCol, dim, bits, tables))
      kept
    } else {
      val kept = Similarity.dedupAgainstSignIndex(batch, idCol, vecCol,
        corpusTable.current, indexTable.current, tau, dim, bits, tables)
      corpusTable.merge(kept)
      indexTable.merge(Similarity.signBucketIndex(kept, idCol, vecCol, dim, bits, tables))
      kept
    }
  }

  /** Start the streaming flow over `stream` (must carry `idCol`, `vecCol`). */
  def start(stream: DataFrame, idCol: String, vecCol: String,
            corpusTable: KeyedTable, indexTable: KeyedTable,
            checkpoint: String, tau: Double, dim: Int,
            bits: Int = 16, tables: Int = 8): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, _: Long) =>
        processBatch(b, idCol, vecCol, corpusTable, indexTable, tau, dim, bits, tables)
        ()
      }
      .start()
}
