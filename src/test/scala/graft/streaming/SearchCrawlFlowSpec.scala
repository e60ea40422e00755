package graft.streaming

import graft.SparkSpec
import graft.engine.{Audit, KeyedTable}
import graft.operators.{Retrieval, TextOps, Web}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The searchable-crawl composition: every batch leaves a corpus whose
  * BM25 statistics exactly match a from-scratch derivation, duplicates
  * never inflate df, and replayed epochs are no-ops.
  */
class SearchCrawlFlowSpec extends SparkSpec {

  private def page(title: String, body: String): String =
    s"<html><head><title>$title</title></head><body><p>$body</p></body></html>"

  private def warcFile(recs: (String, String)*): Array[Byte] =
    Web.encodeWarcFile(recs.map { case (u, b) => (u, b.getBytes("UTF-8")) })

  private def tables(name: String) = (
    KeyedTable(spark, tmpDir(s"$name-docs"), Seq("fp"), numBuckets = 4),
    KeyedTable(spark, tmpDir(s"$name-df"), Seq("tok"), numBuckets = 4),
    KeyedTable(spark, tmpDir(s"$name-corpus"), Seq("scope")))

  private def statsClean(docsT: KeyedTable, dfT: KeyedTable): Unit = {
    val expected = docsT.current.select(col("fp"),
        explode(array_distinct(TextOps.tokens(col("clean_text")))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val a = Audit.viewAudit(dfT, expected, Seq("tok")).collect()(0)
    assert(a.getInt(a.fieldIndex("audit_ok")) == 1, a)
  }

  test("crawl batches maintain a queryable BM25 index; dups never touch df") {
    val s = spark
    import s.implicits._
    val (docsT, dfT, corpusT) = tables("scf")

    val b1 = Seq(
      (0L, warcFile(
        "https://a/one" -> page("One", "spark streams merge windows nightly"),
        "https://a/two" -> page("Two", "unrelated prose about foxes"))),
      (1L, warcFile( // same content as /a/one under a mirror URI
        "https://mirror/one" -> page("One", "spark streams merge windows nightly"))),
    ).toDF("file_id", "content")
    val s1 = SearchCrawlFlow.processBatch(spark, b1, docsT, dfT, corpusT, epochId = 0L)
    assert(s1.records == 3 && s1.kept == 2) // the mirror collapsed
    statsClean(docsT, dfT)

    // the index answers NOW, from maintained stats only
    val terms = Seq("spark", "merge", "stream", "window")
    def search(): Seq[Seq[Any]] = {
      val toks = docsT.current.select(col("fp"),
        TextOps.tokens(col("clean_text")).as("__w"))
      val hits = toks.select(col("fp"), size(col("__w")).cast("long").as("dl"),
          explode(col("__w")).as("tok"))
        .filter(col("tok").isin(terms: _*))
      val tf = hits.groupBy("fp", "tok").agg(count(lit(1)).as("tf"), max("dl").as("dl"))
      val dfr = dfT.current.filter(col("tok").isin(terms: _*))
        .select(col("tok"), col("cnt").as("df"))
      val tot = corpusT.current.select(col("sum_dl").cast("long").as("N_T"),
        col("cnt").as("N_N"))
      Retrieval.scoreAndRank(
        tf.join(broadcast(dfr), "tok").crossJoin(broadcast(tot)), "fp", 5)
        .collect().map(_.toSeq).toSeq
    }
    val r1 = search()
    assert(r1.nonEmpty)
    // maintained-stats search ≡ ad-hoc BM25 over the stored corpus
    assert(r1 == Retrieval.bm25TopK(docsT.current, "fp", "clean_text", terms, 5)
      .collect().map(_.toSeq).toSeq)

    // batch 2: one replayed page (cross-batch drop) + one new match
    val b2 = Seq((2L, warcFile(
      "https://again/one" -> page("One", "spark streams merge windows nightly"),
      "https://a/three" -> page("Three", "windows merge quietly at dawn")))).toDF("file_id", "content")
    val s2 = SearchCrawlFlow.processBatch(spark, b2, docsT, dfT, corpusT, epochId = 1L)
    assert(s2.kept == 1)
    statsClean(docsT, dfT)
    val r2 = search()
    // exact-token matching: "streams"/"windows" ≠ "stream"/"window", so
    // the matchers are page one (spark, merge) and page three (merge)
    assert(r2.size == 2)
    assert(r2 == Retrieval.bm25TopK(docsT.current, "fp", "clean_text", terms, 5)
      .collect().map(_.toSeq).toSeq)

    // replayed epoch: nothing anywhere moves
    val vs = (docsT.currentVersion, dfT.currentVersion, corpusT.currentVersion)
    val s3 = SearchCrawlFlow.processBatch(spark, b2, docsT, dfT, corpusT, epochId = 1L)
    assert(s3.kept == 0)
    assert((docsT.currentVersion, dfT.currentVersion, corpusT.currentVersion) == vs)
  }

  test("streaming: corrupt archives quarantined, checkpoint restart no-op") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (docsT, dfT, corpusT) = tables("scf2")
    val ckpt = tmpDir("scf2-ckpt")
    val good = warcFile("https://x/1" -> page("T", "kilo lima mike"))
    val bad = warcFile("https://x/2" -> page("U", "november oscar"))
    bad(0) = 'X'
    val in = MemoryStream[(Long, Array[Byte])]
    val q = SearchCrawlFlow.start(in.toDF().toDF("file_id", "content"),
      docsT, dfT, corpusT, ckpt)
    in.addData((0L, good), (1L, bad))
    q.processAllAvailable(); q.stop()
    assert(docsT.current.count() == 1) // the bad archive routed, batch lived
    statsClean(docsT, dfT)
    val vs = (docsT.currentVersion, dfT.currentVersion, corpusT.currentVersion)
    // restart over the same checkpoint: no re-ingestion
    val in2 = MemoryStream[(Long, Array[Byte])]
    in2.addData((0L, good), (1L, bad))
    val q2 = SearchCrawlFlow.start(in2.toDF().toDF("file_id", "content"),
      docsT, dfT, corpusT, ckpt)
    q2.processAllAvailable(); q2.stop()
    assert((docsT.currentVersion, dfT.currentVersion, corpusT.currentVersion) == vs)
  }
}
