package graft.streaming

import graft.engine.{KeyedTable, RetrievalDelta}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of the BM25 statistics triple — an op-coded
  * document stream keeps corpus + df + totals current epoch by epoch
  * through [[RetrievalDelta.maintain]]. Exactly-once the family way: all
  * three applies run under one epoch tag and the corpus table commits
  * LAST, so a redelivered epoch either no-ops entirely (corpus tag
  * matches) or completes exactly the applies the crash cut short (each
  * committed table's own tag no-ops its re-apply).
  */
object RetrievalFlow {

  def processBatch(docsT: KeyedTable, dfT: KeyedTable, corpusT: KeyedTable,
                   batch: DataFrame, epochId: Long, idCol: String = "doc_id",
                   textCol: String = "text", tagPrefix: String = ""): Long = {
    if (!docsT.exists)
      // project to the document schema — bootstrap keeps its input's FULL
      // schema, and the op/seq/old-image columns must not bake into it
      RetrievalDelta.bootstrap(docsT, dfT, corpusT,
        batch.select(org.apache.spark.sql.functions.col(idCol),
          org.apache.spark.sql.functions.col(textCol)).limit(0), idCol, textCol)
    RetrievalDelta.maintain(docsT, dfT, corpusT, batch, idCol, textCol,
      batchId = Some(FlowTags.tag(tagPrefix, epochId)))
  }

  /** `stream` must carry (idCol, textCol, `_old_`textCol, `_op`, `_seq`). */
  def start(stream: DataFrame, docsT: KeyedTable, dfT: KeyedTable,
            corpusT: KeyedTable, checkpoint: String, idCol: String = "doc_id",
            textCol: String = "text"): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, epochId: Long) =>
        processBatch(docsT, dfT, corpusT, b, epochId, idCol, textCol,
          tagPrefix = FlowTags.prefix(checkpoint))
        ()
      }
      .start()
}
