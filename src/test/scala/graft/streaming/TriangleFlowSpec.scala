package graft.streaming

import graft.SparkSpec
import graft.engine.KeyedTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class TriangleFlowSpec extends SparkSpec {

  private def counts(t: KeyedTable): Map[Long, Long] =
    t.current.collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("cnt")).toMap

  private type Ev = (Long, Long, String)

  test("stream boots the view from its own first epoch and maintains across epochs") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val edgesT = KeyedTable(spark, tmpDir("graft-triflow-e"), Seq("a", "b"), numBuckets = 4)
    val countsT = KeyedTable(spark, tmpDir("graft-triflow-c"), Seq("node"), numBuckets = 4)
    val q = TriangleFlow.start(input.toDF().toDF("a", "b", "_op"),
      edgesT, countsT, tmpDir("graft-triflow-ckpt"))

    // epoch 0 on EMPTY tables: path 1-2-3 plus closing edge → one triangle.
    // Stream boot is maintain-only: unlike triangleBootstrap it records
    // delta-touched nodes, so the triangle-less pendant node 4 has no row
    // (the read contract is cnt > 0 anyway — see q_triangle_maintain).
    input.addData((1L, 2L, "I"), (2L, 3L, "I"), (1L, 3L, "I"), (3L, 4L, "I"))
    q.processAllAvailable()
    assert(counts(countsT) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))

    // epoch 1: close {3,4,x} via (1,4) and break {1,2,3} via delete
    input.addData((1L, 4L, "I"), (1L, 2L, "D"))
    q.processAllAvailable()
    q.stop()
    assert(counts(countsT) == Map(1L -> 1L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
    // maintained ≡ recount of final edges
    val recount = graft.operators.Graph.triangleCounts(edgesT.current, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    recount.foreach { case (n, c) => assert(counts(countsT)(n) == c) }
  }

  test("redelivered epoch no-ops under the tag") {
    val s = spark
    import s.implicits._
    val edgesT = KeyedTable(spark, tmpDir("graft-triflow2-e"), Seq("a", "b"))
    val countsT = KeyedTable(spark, tmpDir("graft-triflow2-c"), Seq("node"))
    val b = Seq((1L, 2L, "I"), (2L, 3L, "I"), (1L, 3L, "I")).toDF("a", "b", "_op")
    TriangleFlow.processBatch(edgesT, countsT, b, epochId = 0L)
    assert(counts(countsT) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // foreachBatch-retry shape: same epoch, same data — counts must not move
    TriangleFlow.processBatch(edgesT, countsT, b, epochId = 0L)
    assert(counts(countsT) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
