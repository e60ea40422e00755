package graft.streaming

import graft.SparkSpec
import graft.engine.{DistinctState, KeyedTable}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class DistinctFlowSpec extends SparkSpec {

  private def estimates(t: KeyedTable): Map[String, Long] =
    DistinctState.estimate(t.current, Seq("g")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("stream grows per-group sketches across epochs; estimates track the union") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val state = KeyedTable(spark, tmpDir("graft-dflow"), Seq("g"), numBuckets = 4)
    val q = DistinctFlow.start(input.toDF().toDF("g", "v"),
      state, Seq("g"), "v", tmpDir("graft-dflow-ckpt"))

    // epoch 0 auto-bootstraps empty state
    input.addData((0 until 1000).map(i => ("a", i.toLong)) ++
      (0 until 200).map(i => ("b", i.toLong)): _*)
    q.processAllAvailable()
    val e0 = estimates(state)
    assert(math.abs(e0("a") / 1000.0 - 1) <= 0.05, s"a: ${e0("a")}")
    assert(math.abs(e0("b") / 200.0 - 1) <= 0.05, s"b: ${e0("b")}")

    // epoch 1: overlap + growth on a only — b's sketch must ride through
    input.addData((500 until 2000).map(i => ("a", i.toLong)): _*)
    q.processAllAvailable()
    q.stop()
    val e1 = estimates(state)
    assert(math.abs(e1("a") / 2000.0 - 1) <= 0.05, s"a: ${e1("a")}")
    assert(e1("b") == e0("b"))
  }

  test("checkpoint restart does not re-absorb delivered epochs") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val state = KeyedTable(spark, tmpDir("graft-dflow2"), Seq("g"))
    val ckpt = tmpDir("graft-dflow2-ckpt")

    val in1 = MemoryStream[(String, Long)]
    val q1 = DistinctFlow.start(in1.toDF().toDF("g", "v"), state, Seq("g"), "v", ckpt)
    in1.addData((0 until 500).map(i => ("a", i.toLong)): _*)
    q1.processAllAvailable(); q1.stop()
    val vAfter = state.currentVersion
    val eAfter = estimates(state)("a")

    // same checkpoint, fresh source: no new data → no state commit at all
    val in2 = MemoryStream[(String, Long)]
    val q2 = DistinctFlow.start(in2.toDF().toDF("g", "v"), state, Seq("g"), "v", ckpt)
    q2.processAllAvailable(); q2.stop()
    assert(state.currentVersion == vAfter)
    assert(estimates(state)("a") == eAfter)
  }

  test("foreachBatch-retry shape: redelivered epoch id no-ops bit-exactly") {
    val s = spark
    import s.implicits._
    val state = KeyedTable(spark, tmpDir("graft-dflow3"), Seq("g"))
    val b = (0 until 800).map(i => ("a", i.toLong)).toDF("g", "v")
    DistinctFlow.processBatch(state, b, Seq("g"), "v", epochId = 0L)
    val v1 = state.currentVersion
    val e1 = estimates(state)("a")
    assert(DistinctFlow.processBatch(state, b, Seq("g"), "v", epochId = 0L) == v1)
    assert(estimates(state)("a") == e1) // exactly invariant, not just in-bound
    DistinctFlow.processBatch(state, b, Seq("g"), "v", epochId = 1L)
    assert(math.abs(estimates(state)("a") / 800.0 - 1) <= 0.05) // re-union: set-wise no-op
  }
}
