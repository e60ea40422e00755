package graft.streaming

import graft.SparkSpec
import graft.engine.KeyedTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class DedupFlowSpec extends SparkSpec {

  private val base =
    "the quick brown fox jumps over the lazy dog while rain falls softly on the quiet green meadow today"
  private val novel =
    "completely different subject matter here about spark shuffles partitions and broadcast joins at scale"

  test("streaming batches dedup against the growing stored corpus") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val corpusT = KeyedTable(spark, tmpDir("graft-dflow-corpus"), Seq("doc_id"))
    val indexT = KeyedTable(spark, tmpDir("graft-dflow-index"), Seq("id", "band_idx"))
    val q = DedupFlow.start(input.toDF().toDF("doc_id", "text"),
      "doc_id", "text", corpusT, indexT, tmpDir("graft-dflow-ckpt"))

    // batch 1: 2 near-dups base, internal smaller id wins; 3 novel
    input.addData((1L, base), (2L, base.replace("today", "tonight")), (3L, novel))
    q.processAllAvailable()
    assert(corpusT.current.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))

    // batch 2: 11 dups the STORED corpus doc 1; 12 is fresh
    input.addData((11L, base.replace("quick", "swift")), (12L, "genuinely new content with many words"))
    q.processAllAvailable()
    q.stop()
    assert(corpusT.current.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L, 12L))
    // index covers exactly the surviving corpus
    assert(indexT.current.select("id").distinct().collect().map(_.getLong(0)).toSet == Set(1L, 3L, 12L))
  }

  test("processBatch replay is idempotent (self-match drops replayed docs)") {
    val s = spark
    import s.implicits._
    val corpusT = KeyedTable(spark, tmpDir("graft-dflow-c2"), Seq("doc_id"))
    val indexT = KeyedTable(spark, tmpDir("graft-dflow-i2"), Seq("id", "band_idx"))
    val b1 = Seq((1L, base), (3L, novel)).toDF("doc_id", "text")
    DedupFlow.processBatch(b1, "doc_id", "text", corpusT, indexT)
    val keptReplay = DedupFlow.processBatch(b1, "doc_id", "text", corpusT, indexT)
    assert(keptReplay.isEmpty)
    assert(corpusT.current.count() == 2)
  }
}
