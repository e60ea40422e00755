package graft.streaming

import graft.SparkSpec
import graft.engine.KeyedTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class VectorDedupFlowSpec extends SparkSpec {

  // clustered 16-dim fixtures: near-dups share a cluster direction with tiny
  // per-member noise (cosine ≈ 0.999+); cross-cluster cosines are far below
  // tau — the regime sign-LSH mining is built for
  private def vec(cluster: Int, i: Int): Seq[Float] =
    (0 until 16).map { d =>
      math.sin(cluster * 17.0 + d).toFloat * 2f + (((i * 31 + d * 7) % 11) - 5) * 0.002f
    }

  test("streaming vector batches dedup against the growing stored corpus") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val corpusT = KeyedTable(spark, tmpDir("graft-vflow-corpus"), Seq("vec_id"))
    val indexT = KeyedTable(spark, tmpDir("graft-vflow-index"), Seq("id", "tbl"))
    val q = VectorDedupFlow.start(input.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", corpusT, indexT, tmpDir("graft-vflow-ckpt"),
      tau = 0.99, dim = 16, bits = 8, tables = 4)

    // batch 1: 1 and 2 near-dup (same cluster) — smaller id wins; 3 novel
    input.addData((1L, vec(0, 1)), (2L, vec(0, 2)), (3L, vec(1, 1)))
    q.processAllAvailable()
    assert(corpusT.current.select("vec_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))

    // batch 2: 11 dups STORED corpus vector 1; 12 is a fresh cluster
    input.addData((11L, vec(0, 3)), (12L, vec(2, 1)))
    q.processAllAvailable()
    q.stop()
    assert(corpusT.current.select("vec_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L, 12L))
    // index covers exactly the surviving corpus
    assert(indexT.current.select("id").distinct().collect().map(_.getLong(0)).toSet == Set(1L, 3L, 12L))
  }

  test("vector processBatch replay is idempotent (self-match drops replayed vectors)") {
    val s = spark
    import s.implicits._
    val corpusT = KeyedTable(spark, tmpDir("graft-vflow-c2"), Seq("vec_id"))
    val indexT = KeyedTable(spark, tmpDir("graft-vflow-i2"), Seq("id", "tbl"))
    val b1 = Seq((1L, vec(0, 1)), (3L, vec(1, 1))).toDF("vec_id", "embedding")
    VectorDedupFlow.processBatch(b1, "vec_id", "embedding", corpusT, indexT,
      tau = 0.99, dim = 16, bits = 8, tables = 4)
    val keptReplay = VectorDedupFlow.processBatch(b1, "vec_id", "embedding",
      corpusT, indexT, tau = 0.99, dim = 16, bits = 8, tables = 4)
    assert(keptReplay.isEmpty)
    assert(corpusT.current.count() == 2)
  }

  test("dedupAgainstSignIndex is pure, applies corpus-wins and drop-larger rules") {
    val s = spark
    import s.implicits._
    val corpus = Seq((10L, vec(0, 1)), (20L, vec(1, 1))).toDF("vec_id", "embedding")
    val index = graft.operators.Similarity.signBucketIndex(corpus, "vec_id", "embedding",
      dim = 16, bits = 8, tables = 4)
    // 5 dups corpus 10 DESPITE having a smaller id (corpus wins regardless);
    // 30 and 31 near-dup each other (larger 31 drops); 40 is novel
    val batch = Seq((5L, vec(0, 2)), (30L, vec(2, 1)), (31L, vec(2, 2)), (40L, vec(3, 1)))
      .toDF("vec_id", "embedding")
    val kept = graft.operators.Similarity.dedupAgainstSignIndex(batch, "vec_id", "embedding",
      corpus, index, tau = 0.99, dim = 16, bits = 8, tables = 4)
    assert(kept.select("vec_id").collect().map(_.getLong(0)).toSet == Set(30L, 40L))
  }
}
