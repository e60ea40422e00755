package graft.streaming

import graft.SparkSpec
import graft.engine.{KeyedTable, Scd2}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class Scd2FlowSpec extends SparkSpec {

  private type Ev = (String, String, String, java.lang.Integer) // id, v, _op, _seq

  private def rows(t: KeyedTable): Set[(String, String, Long, Option[Long], Boolean)] =
    t.current.collect().map { r =>
      (r.getAs[String]("id"), r.getAs[String]("v"),
        r.getAs[Long]("valid_from"),
        Option(r.getAs[java.lang.Long]("valid_to")).map(_.longValue()),
        r.getAs[Boolean]("is_current"))
    }.toSet

  test("stream grows history across epochs; checkpoint restart does not re-close rows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = KeyedTable(spark, tmpDir("scd2flow"), Seq("id"), numBuckets = 4)
    Scd2.bootstrap(t, Seq(("a", "a0"), ("b", "b0")).toDF("id", "v"))
    val ckpt = tmpDir("scd2flow-ckpt")
    val input = MemoryStream[Ev]
    def run() = Scd2Flow.start(input.toDF().toDF("id", "v", "_op", "_seq"), t, ckpt)

    val q = run()
    input.addData(("a", "a1", "U", 5): Ev)
    q.processAllAvailable()
    input.addData(("b", null, "D", 6): Ev, ("c", "c0", "I", 7): Ev)
    q.processAllAvailable()
    q.stop()
    val expect = Set(
      ("a", "a0", 0L, Some(5L), false), ("a", "a1", 5L, None, true),
      ("b", "b0", 0L, Some(6L), false),
      ("c", "c0", 7L, None, true))
    assert(rows(t) == expect)

    // restart from the checkpoint: the committed epochs replay nowhere —
    // without the tag guard this would raise out-of-order (re-closing a0
    // at 5 against boundary 5) or duplicate history
    val v = t.currentVersion
    val q2 = run()
    q2.processAllAvailable()
    q2.stop()
    assert(t.currentVersion == v && rows(t) == expect)
  }

  test("same-epoch redelivery no-ops via the tag; a NEW epoch with stale seqs still fails loudly") {
    val s = spark
    import s.implicits._
    val t = KeyedTable(spark, tmpDir("scd2flow2"), Seq("id"), numBuckets = 4)
    Scd2.bootstrap(t, Seq(("a", "a0")).toDF("id", "v"))
    val b = Seq(("a", "a1", "U", 4): Ev).toDF("id", "v", "_op", "_seq")
    val v1 = Scd2Flow.processBatch(t, b, epochId = 3L)
    assert(Scd2Flow.processBatch(t, b, epochId = 3L) == v1) // retry window
    // a different epoch carrying the same stale data is NOT a retry —
    // the monotonicity guard fires instead of silently corrupting
    val e = intercept[Exception] { Scd2Flow.processBatch(t, b, epochId = 4L) }
    val chain = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("out-of-order"), chain)
  }
}
