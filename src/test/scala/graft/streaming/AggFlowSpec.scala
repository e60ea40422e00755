package graft.streaming

import graft.SparkSpec
import graft.engine.KeyedTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class AggFlowSpec extends SparkSpec {

  private def state(t: KeyedTable): Map[String, (Long, BigDecimal)] =
    t.current.collect().map(r => r.getString(0) ->
      (r.getLong(1), BigDecimal(r.getDecimal(2)))).toMap

  // (g, v, _old_g, _old_v, _op)
  private type Ev = (String, java.lang.Double, String, java.lang.Double, String)

  test("stream maintains the aggregate across epochs; cross-batch group moves and deaths") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val agg = KeyedTable(spark, tmpDir("graft-aggflow"), Seq("g"), numBuckets = 4)
    val q = AggFlow.start(input.toDF().toDF("g", "v", "_old_g", "_old_v", "_op"),
      agg, Seq("g"), Seq("v"), tmpDir("graft-aggflow-ckpt"))

    // epoch 0: pure inserts bootstrap empty state
    input.addData(
      ("a", 10.0, null, null, "I"): Ev,
      ("a", 20.0, null, null, "I"): Ev,
      ("b", 30.0, null, null, "I"): Ev)
    q.processAllAvailable()
    assert(state(agg) == Map("a" -> ((2L, BigDecimal(30))), "b" -> ((1L, BigDecimal(30)))))

    // epoch 1: update moves a row a→b, delete kills the rest of a
    input.addData(
      ("b", 25.0, "a", 10.0, "U"): Ev,
      (null, null, "a", 20.0, "D"): Ev)
    q.processAllAvailable()
    q.stop()
    assert(state(agg) == Map("b" -> ((2L, BigDecimal(55)))))
    assert(!state(agg).contains("a"))
  }

  test("redelivered epoch no-ops: version tag blocks double-counting") {
    val s = spark
    import s.implicits._
    val agg = KeyedTable(spark, tmpDir("graft-aggflow2"), Seq("g"))
    val b = Seq(("a", 10.0, null.asInstanceOf[String],
      null.asInstanceOf[java.lang.Double], "I")).toDF("g", "v", "_old_g", "_old_v", "_op")
    AggFlow.processBatch(agg, b, Seq("g"), Seq("v"), epochId = 0L)
    val v1 = agg.currentVersion
    // the foreachBatch-retry shape: same epoch id, same data, re-applied
    assert(AggFlow.processBatch(agg, b, Seq("g"), Seq("v"), epochId = 0L) == v1)
    assert(state(agg)("a") == ((1L, BigDecimal(10))))
    // next epoch applies normally
    AggFlow.processBatch(agg, b, Seq("g"), Seq("v"), epochId = 1L)
    assert(state(agg)("a") == ((2L, BigDecimal(20))))
  }

  test("mid-stream start with unseen-group retraction fails loudly, not silently wrong") {
    val s = spark
    import s.implicits._
    val agg = KeyedTable(spark, tmpDir("graft-aggflow3"), Seq("g"))
    val bad = Seq((null.asInstanceOf[String], null.asInstanceOf[java.lang.Double],
      "ghost", 5.0, "D")).toDF("g", "v", "_old_g", "_old_v", "_op")
    val e = intercept[Exception] { AggFlow.processBatch(agg, bad, Seq("g"), Seq("v"), 0L) }
    val chain = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("retracted below zero"), chain)
  }
}
