package graft.streaming

import graft.SparkSpec
import graft.engine.{JoinDelta, KeyedTable}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class JoinFlowSpec extends SparkSpec {

  // multiplexed event: (_side, fid, dref, m, _old_dref, did, name, _op, _seq)
  private type Ev = (String, String, String, java.lang.Integer, String,
    String, String, String, java.lang.Integer)
  private val cols = Seq("_side", "fid", "dref", "m", "_old_dref", "did", "name", "_op", "_seq")

  private def mk(pfx: String) = {
    val d = tmpDir(pfx)
    val f = KeyedTable(spark, s"$d/fact", Seq("fid"), numBuckets = 4)
    val dm = KeyedTable(spark, s"$d/dim", Seq("did"), numBuckets = 2)
    val v = KeyedTable(spark, s"$d/view", Seq("fid"), numBuckets = 4)
    val ix = KeyedTable(spark, s"$d/index", Seq("dref", "fid"), numBuckets = 4,
      rangeCol = Some("dref"))
    val s = spark
    import s.implicits._
    f.overwrite(Seq(("f1", "d1", 10), ("f2", "d2", 20)).toDF("fid", "dref", "m"))
    dm.overwrite(Seq(("d1", "one"), ("d2", "two")).toDF("did", "name"))
    JoinDelta.bootstrap(v, ix, f.current, dm.current, "dref", "did", "inner")
    (f, dm, v, ix)
  }

  private def viewRows(v: KeyedTable): Set[(String, String, Int, String)] =
    v.current.collect().map(r => (r.getAs[String]("fid"), r.getAs[String]("dref"),
      r.getAs[Int]("m"), r.getAs[String]("name"))).toSet

  test("multiplexed stream maintains view and index across epochs; replay after restart is a no-op") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (f, dm, v, ix) = mk("jf")
    val ckpt = tmpDir("jf-ckpt")
    val input = MemoryStream[Ev]
    def run() = JoinFlow.start(input.toDF().toDF(cols: _*), f, dm, v, ix, ckpt,
      "dref", "did", factCols = Seq("fid", "dref", "m"), dimCols = Seq("did", "name"))

    val q = run()
    // epoch: fact insert + dim update in ONE batch
    input.addData(
      ("fact", "f3", "d1", 30, null, null, null, "I", 1): Ev,
      ("dim", null, null, null, null, "d2", "TWO", "U", 1): Ev)
    q.processAllAvailable()
    assert(viewRows(v) == Set(("f1", "d1", 10, "one"), ("f2", "d2", 20, "TWO"),
      ("f3", "d1", 30, "one")))

    // next epoch: dim-reference move + dim delete cascading f1 away... no:
    // move f1 to d2, delete d1 — f3 (still on d1) cascades away
    input.addData(
      ("fact", "f1", "d2", 11, "d1", null, null, "U", 2): Ev,
      ("dim", null, null, null, null, "d1", null, "D", 2): Ev)
    q.processAllAvailable()
    q.stop()
    assert(viewRows(v) == Set(("f1", "d2", 11, "TWO"), ("f2", "d2", 20, "TWO")))
    assert(ix.current.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("d2", "f1"), ("d1", "f3"), ("d2", "f2"))) // index tracks facts; f3 pair stays

    // restart from the checkpoint: nothing re-applies, state unchanged
    val versions = (f.currentVersion, dm.currentVersion, v.currentVersion, ix.currentVersion)
    val q2 = run()
    q2.processAllAvailable()
    q2.stop()
    assert((f.currentVersion, dm.currentVersion, v.currentVersion, ix.currentVersion) == versions)
  }

  test("single-sided epochs skip the absent side's table version entirely") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (f, dm, v, ix) = mk("jf2")
    val input = MemoryStream[Ev]
    val q = JoinFlow.start(input.toDF().toDF(cols: _*), f, dm, v, ix, tmpDir("jf2-ckpt"),
      "dref", "did", factCols = Seq("fid", "dref", "m"), dimCols = Seq("did", "name"))
    val dimV = dm.currentVersion
    input.addData(("fact", "f3", "d2", 30, null, null, null, "I", 1): Ev)
    q.processAllAvailable()
    q.stop()
    assert(dm.currentVersion == dimV) // dim never touched by an all-fact epoch
    assert(viewRows(v) == Set(("f1", "d1", 10, "one"), ("f2", "d2", 20, "two"),
      ("f3", "d2", 30, "two")))
  }

  test("crash-window redelivery (same epoch re-applied) converges to the same state") {
    val s = spark
    import s.implicits._
    val (f, dm, v, ix) = mk("jf3")
    val b = Seq(
      ("fact", "f1", "d2", 11, "d1", null, null, "U", 1): Ev,
      ("dim", null, null, null, null, "d2", "TWO", "U", 1): Ev).toDF(cols: _*)
    JoinFlow.processBatch(f, dm, v, ix, b, 7L, "dref", "did",
      Seq("fid", "dref", "m"), Seq("did", "name"))
    val after = (viewRows(v), f.currentVersion, v.currentVersion)
    // the foreachBatch-retry shape: same epoch id, same data
    JoinFlow.processBatch(f, dm, v, ix, b, 7L, "dref", "did",
      Seq("fid", "dref", "m"), Seq("did", "name"))
    assert((viewRows(v), f.currentVersion, v.currentVersion) == after)
    assert(viewRows(v) == Set(("f1", "d2", 11, "TWO"), ("f2", "d2", 20, "TWO")))
  }
}
