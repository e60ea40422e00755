package graft.streaming

import graft.engine.{KeyedTable, RetrievalDelta}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming SEARCHABLE crawl — the crawl front composed with the
  * retrieval maintainer: each micro-batch of WARC archives is parsed,
  * quarantine-routed, extracted and content-dedup'd exactly like
  * [[CrawlFlow]], and the surviving new pages feed
  * [[RetrievalDelta.maintain]] as insert events — so the corpus, the
  * per-term document frequencies, and the totals BM25 needs are all
  * current the moment the batch commits. A crawl whose index is always
  * queryable, with per-batch cost ∝ the batch's new postings.
  *
  * Fault story, composed from the two parents' guarantees: the fresh-page
  * anti-join is computed against the corpus table (replayed pages
  * self-match and drop — CrawlFlow's license), and the three-table apply
  * runs under the epoch tag with the corpus committing last
  * (RetrievalDelta's rule) — so a replayed epoch either no-ops entirely
  * or completes exactly the applies a crash cut short. `I`-only events by
  * construction: the anti-join guarantees every fed key is absent, which
  * is precisely the contract RetrievalDelta's statistics need.
  */
object SearchCrawlFlow {

  def processBatch(spark: org.apache.spark.sql.SparkSession, files: DataFrame,
                   docsT: KeyedTable, dfT: KeyedTable, corpusT: KeyedTable,
                   epochId: Long, gz: Boolean = false,
                   tagPrefix: String = ""): CrawlFlow.BatchStats = {
    val (pages, quarantined, filesOk, nRecs) =
      CrawlFlow.extractPages(spark, files, gz)
    if (!docsT.exists)
      RetrievalDelta.bootstrap(docsT, dfT, corpusT, pages.limit(0),
        idCol = "fp", textCol = "clean_text")
    val fresh = pages.join(docsT.current.select("fp"), Seq("fp"), "left_anti")
      .localCheckpoint()
    val kept = fresh.count()
    if (kept > 0)
      RetrievalDelta.maintain(docsT, dfT, corpusT,
        fresh.withColumn("_old_clean_text", lit(null).cast("string"))
          .withColumn("_op", lit("I")).withColumn("_seq", lit(1L)),
        idCol = "fp", textCol = "clean_text",
        batchId = Some(FlowTags.tag(tagPrefix, epochId)))
    CrawlFlow.BatchStats(filesOk, quarantined, nRecs, kept)
  }

  def start(stream: DataFrame, docsT: KeyedTable, dfT: KeyedTable,
            corpusT: KeyedTable, checkpoint: String,
            gz: Boolean = false): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, epochId: Long) =>
        processBatch(b.sparkSession, b, docsT, dfT, corpusT, epochId, gz,
          tagPrefix = FlowTags.prefix(checkpoint))
        ()
      }
      .start()
}
