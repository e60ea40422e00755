package graft.streaming

import graft.SparkSpec
import graft.engine.{KeyedTable, TopKDelta}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class TopKFlowSpec extends SparkSpec {

  // (g, id, sc, _old_g, _op, _seq)
  private type Ev = (String, String, java.lang.Double, String, String, java.lang.Integer)
  private val cols = Seq("g", "id", "sc", "_old_g", "_op", "_seq")

  private def answer(t: KeyedTable, k: Int): Set[(String, String, Double, Int)] =
    TopKDelta.topK(t.current, Seq("g"), Seq("id"), "sc", k).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getInt(3))).toSet

  test("stream maintains the leaderboard; a delete-heavy epoch refills from the riding fact table") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val d = tmpDir("tkflow")
    val fact = KeyedTable(spark, s"$d/fact", Seq("id"), numBuckets = 4)
    val st = KeyedTable(spark, s"$d/state", Seq("g"), numBuckets = 4)
    val base = Seq(("a", "a1", 80.0), ("a", "a2", 70.0), ("a", "a3", 60.0),
      ("a", "a4", 50.0), ("a", "a5", 40.0), ("a", "a6", 30.0)).toDF("g", "id", "sc")
    fact.overwrite(base)
    TopKDelta.bootstrap(st, base, Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2)

    val ckpt = tmpDir("tkflow-ckpt")
    val input = MemoryStream[Ev]
    def run() = TopKFlow.start(input.toDF().toDF(cols: _*), fact, st, ckpt,
      Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2)

    val q = run()
    input.addData(("a", "a0", 99.0, null, "I", 1): Ev)
    q.processAllAvailable()
    assert(answer(st, 2) == Set(("a", "a0", 99.0, 1), ("a", "a1", 80.0, 2)))

    // wipe the whole buffered top (a0,a1,a2,a3 + the displaced a4 is gone
    // from the buffer already) — the guarantee collapses and only the
    // RIDING fact table (now without the deleted rows) can refill a5/a6
    input.addData(
      (null, "a0", null, "a", "D", 2): Ev, (null, "a1", null, "a", "D", 2): Ev,
      (null, "a2", null, "a", "D", 2): Ev, (null, "a3", null, "a", "D", 2): Ev)
    q.processAllAvailable()
    q.stop()
    assert(answer(st, 2) == Set(("a", "a4", 50.0, 1), ("a", "a5", 40.0, 2)))

    // checkpoint restart: committed epochs replay nowhere
    val versions = (fact.currentVersion, st.currentVersion)
    val q2 = run()
    q2.processAllAvailable()
    q2.stop()
    assert((fact.currentVersion, st.currentVersion) == versions)
  }

  test("same-epoch redelivery no-ops on both tables (no duplicate buffer rows)") {
    val s = spark
    import s.implicits._
    val d = tmpDir("tkflow2")
    val fact = KeyedTable(spark, s"$d/fact", Seq("id"), numBuckets = 4)
    val st = KeyedTable(spark, s"$d/state", Seq("g"), numBuckets = 4)
    val base = Seq(("a", "a1", 80.0)).toDF("g", "id", "sc")
    fact.overwrite(base)
    TopKDelta.bootstrap(st, base, Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2)
    val b = Seq(("a", "a2", 90.0, null, "I", 1): Ev).toDF(cols: _*)
    TopKFlow.processBatch(fact, st, b, 5L, Seq("g"), Seq("id"), "sc", k = 2)
    val versions = (fact.currentVersion, st.currentVersion)
    TopKFlow.processBatch(fact, st, b, 5L, Seq("g"), Seq("id"), "sc", k = 2)
    assert((fact.currentVersion, st.currentVersion) == versions)
    assert(st.current.count() == 2) // a redelivered insert must not duplicate
    assert(answer(st, 2) == Set(("a", "a2", 90.0, 1), ("a", "a1", 80.0, 2)))
  }

  test("streaming with a group-keyed replica: refills ride the replica, replica stays current") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val d = tmpDir("tkflow3")
    val fact = KeyedTable(spark, s"$d/fact", Seq("id"), numBuckets = 4)
    val st = KeyedTable(spark, s"$d/state", Seq("g"), numBuckets = 4)
    val rep = KeyedTable(spark, s"$d/replica", Seq("g", "id"),
      numBuckets = 4, rangeCol = Some("g"))
    val base = Seq(("a", "a1", 80.0), ("a", "a2", 70.0), ("a", "a3", 60.0),
      ("a", "a4", 50.0), ("a", "a5", 40.0), ("a", "a6", 30.0)).toDF("g", "id", "sc")
    fact.overwrite(base)
    TopKDelta.bootstrap(st, base, Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2)
    TopKDelta.replicaBootstrap(rep, base, Seq("g"), Seq("id"), "sc")
    val ckpt = tmpDir("tkflow3-ckpt")
    val input = MemoryStream[Ev]
    val q = TopKFlow.start(input.toDF().toDF(cols: _*), fact, st, ckpt,
      Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2,
      factsReplica = Some(rep))
    input.addData(("a", "a0", 99.0, null, "I", 1): Ev)
    q.processAllAvailable()
    // delete the buffered top — the refill must find a5/a6, which only
    // CURRENT (post-delete, post-insert) fact state contains
    input.addData(
      (null, "a0", null, "a", "D", 2): Ev, (null, "a1", null, "a", "D", 2): Ev,
      (null, "a2", null, "a", "D", 2): Ev, (null, "a3", null, "a", "D", 2): Ev)
    q.processAllAvailable()
    q.stop()
    assert(answer(st, 2) == Set(("a", "a4", 50.0, 1), ("a", "a5", 40.0, 2)))
    // the replica tracked both epochs (insert then 4 deletes): 6+1-4 rows
    assert(rep.current.count() == fact.current.count())
    assert(rep.current.count() == 3)
  }
}
