package graft.streaming

import graft.SparkSpec
import graft.engine.KeyedTable
import graft.operators.Web
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Pins the crawl-ingestion composition: quarantine routing keeps the
  * batch alive, content dedup collapses same-article URLs within AND
  * across batches, and crash-replay is a corpus no-op.
  */
class CrawlFlowSpec extends SparkSpec {

  private def page(title: String, body: String): String =
    s"<html><head><title>$title</title></head><body><p>$body</p></body></html>"

  private def warcFile(recs: (String, String)*): Array[Byte] =
    Web.encodeWarcFile(recs.map { case (u, b) => (u, b.getBytes("UTF-8")) })

  test("batch flow: quarantine routed, same-content URLs collapse, cross-batch dedup") {
    val s = spark
    import s.implicits._
    val corpus = KeyedTable(spark, tmpDir("graft-crawl"), Seq("fp"))

    // file 0: two distinct pages; file 1: a clone of page A under a new
    // URI (same content after extraction → within-batch collapse);
    // file 2: corrupt magic → quarantined, siblings in other files live
    val f0 = warcFile(
      "https://a/one" -> page("One", "alpha bravo charlie"),
      "https://a/two" -> page("Two", "delta echo foxtrot"))
    val f1 = warcFile(
      "https://mirror/one" -> page("One", "alpha bravo charlie"))
    val f2 = warcFile("https://a/bad" -> page("Bad", "gone"))
    f2(0) = 'X'
    val b1 = Seq((0L, f0), (1L, f1), (2L, f2)).toDF("file_id", "content")

    val s1 = CrawlFlow.processBatch(spark, b1, corpus)
    assert(s1.filesQuarantined == 1 && s1.filesOk == 2)
    assert(s1.records == 3) // the quarantined file's record never parsed
    assert(s1.kept == 2)    // clone collapsed within the batch
    assert(corpus.current.count() == 2)

    // batch 2: replay of page B under yet another URI (cross-batch drop)
    // plus one genuinely new page
    val b2 = Seq((3L, warcFile(
      "https://again/two" -> page("Two", "delta echo foxtrot"),
      "https://a/three" -> page("Three", "golf hotel india")))).toDF("file_id", "content")
    val s2 = CrawlFlow.processBatch(spark, b2, corpus)
    assert(s2.records == 2 && s2.kept == 1)
    assert(corpus.current.count() == 3)

    // full replay of batch 2 (the crash-retry shape): corpus no-op
    val v = corpus.currentVersion
    val s3 = CrawlFlow.processBatch(spark, b2, corpus)
    assert(s3.kept == 0)
    assert(corpus.currentVersion == v) // kept == 0 → no new version committed
  }

  test("streaming flow over a file stream; checkpoint restart does not re-ingest") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = KeyedTable(spark, tmpDir("graft-crawl2"), Seq("fp"))
    val ckpt = tmpDir("graft-crawl2-ckpt")

    val file1 = warcFile("https://a/1" -> page("T", "kilo lima mike"))
    val in1 = MemoryStream[(Long, Array[Byte])]
    val q1 = CrawlFlow.start(in1.toDF().toDF("file_id", "content"), corpus, ckpt)
    in1.addData((0L, file1))
    q1.processAllAvailable(); q1.stop()
    assert(corpus.current.count() == 1)
    val v = corpus.currentVersion

    // restart on the same checkpoint: the source replays its history
    // (offset log positions are data-positional), the committed epoch is
    // skipped, and only the post-crash file is ingested
    val in2 = MemoryStream[(Long, Array[Byte])]
    in2.addData((0L, file1)) // offset-0 twin of the committed epoch
    in2.addData((1L, warcFile("https://a/2" -> page("U", "november oscar papa"))))
    val q2 = CrawlFlow.start(in2.toDF().toDF("file_id", "content"), corpus, ckpt)
    q2.processAllAvailable(); q2.stop()
    assert(corpus.current.count() == 2)
    assert(corpus.currentVersion == v + 1) // exactly one new commit
  }

  test("gz flow: member-gzipped archives ingest identically") {
    val s = spark
    import s.implicits._
    val corpus = KeyedTable(spark, tmpDir("graft-crawl3"), Seq("fp"))
    val member = Web.gzipMember(Web.warcRecord("https://a/1",
      page("T", "quebec romeo sierra").getBytes("UTF-8")))
    val b = Seq((0L, member)).toDF("file_id", "content")
    val st = CrawlFlow.processBatch(spark, b, corpus, gz = true)
    assert(st.kept == 1 && corpus.current.count() == 1)
  }
}
