package graft.streaming

import graft.engine.KeyedTable
import graft.operators.{TextOps, Web}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming crawl ingestion — the web family composed end-to-end with the
  * incremental-dedup store: a stream of WARC archive files (plain or
  * member-gzipped) is container-parsed, quarantine-routed, main-text
  * extracted, fingerprinted, and EXACT-dedup'd against a persistent corpus
  * table, micro-batch by micro-batch. Batch N+1 automatically dedups
  * against every page batch N kept; the corpus is never re-scanned (the
  * probe is a fingerprint anti-join against the stored table's bucketed
  * key column).
  *
  * Crash-replay is idempotent by construction, the DedupFlow license: a
  * replayed page that already reached the corpus self-matches its
  * fingerprint and is dropped; `KeyedTable.merge` upserts the same key.
  * Quarantined files are COUNTED per batch (returned for observability)
  * but not persisted — corrupt archives are the transport layer's problem
  * to re-fetch, and replaying a repaired file later just flows through.
  *
  * Dedup key: the normalized-text polynomial fingerprint
  * ([[TextOps.fingerprint]]), i.e. content-dedup after boilerplate
  * removal — two URLs serving the same article collapse, the standard
  * crawl-corpus rule. Near-dup layering (MinHash) belongs downstream on
  * the stored corpus ([[DedupFlow]] / the band index) — this flow is the
  * ingestion front.
  */
object CrawlFlow {

  /** Outcome of one micro-batch, for observability + specs. */
  final case class BatchStats(filesOk: Long, filesQuarantined: Long,
                              records: Long, kept: Long)

  /** One micro-batch of WARC files → corpus merge. `gz` selects the
    * member-gzipped walk. Exposed for batch-mode reuse and tests.
    */
  /** Shared front half: routed parse → extraction → fingerprint →
    * within-batch dedup. Returns the pinned page frame `(fp, target_uri,
    * clean_text)` plus the batch's observability counts — reused by the
    * searchable-crawl composition ([[SearchCrawlFlow]]).
    */
  private[streaming] def extractPages(spark: SparkSession, files: DataFrame,
                                      gz: Boolean): (DataFrame, Long, Long, Long) = {
    // route first: a corrupt archive must not kill the batch
    val routed = (if (gz) Web.parseWarcGzRouted(spark, files)
                  else Web.parseWarcRouted(spark, files))
      .select("file_id", "decode_ok").localCheckpoint()
    val okIds = routed.filter(col("decode_ok") === true).select("file_id")
    val quarantined = routed.filter(not(col("decode_ok") <=> true)).count()
    val okFiles = files.join(okIds, Seq("file_id"), "left_semi")
    val recs = (if (gz) Web.parseWarcGz(spark, okFiles)
                else Web.parseWarc(spark, okFiles))
    val pages = recs.select(
        col("target_uri"),
        Web.htmlText(col("body")).as("clean_text"))
      .withColumn("fp", TextOps.fingerprint(col("clean_text")))
      // within-batch exact dedup: first URI per fingerprint wins (ordered,
      // deterministic under retries)
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
          .orderBy(col("target_uri"))))
      .filter(col("__rn") === 1).drop("__rn")
      .localCheckpoint() // pinned: probed once, merged once
    (pages, quarantined, routed.count() - quarantined, recs.count())
  }

  def processBatch(spark: SparkSession, files: DataFrame, corpus: KeyedTable,
                   gz: Boolean = false): BatchStats = {
    val (pages, quarantined, filesOk, nRecs) = extractPages(spark, files, gz)
    val fresh =
      if (!corpus.exists) pages
      else pages.join(corpus.current.select("fp"), Seq("fp"), "left_anti")
    val kept = fresh.count()
    if (!corpus.exists) corpus.overwrite(pages)
    else if (kept > 0) corpus.merge(fresh)
    BatchStats(filesOk, quarantined, nRecs, kept)
  }

  /** Start the flow over a stream of (file_id, content) WARC files. */
  def start(stream: DataFrame, corpus: KeyedTable, checkpoint: String,
            gz: Boolean = false): StreamingQuery = {
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, _: Long) =>
        processBatch(b.sparkSession, b, corpus, gz)
        ()
      }
      .start()
  }
}
