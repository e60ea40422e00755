package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class TopKDeltaSpec extends SparkSpec {

  // facts: (g, id, sc)
  private def facts(rows: (String, String, Double)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("g", "id", "sc")
  }

  // events: (g, id, sc, _old_g, _old_sc, _op)
  private def ev(rows: (String, String, java.lang.Double, String, java.lang.Double, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("g", "id", "sc", "_old_g", "_old_sc", "_op")
  }

  private def mkState(pfx: String) =
    KeyedTable(spark, tmpDir(pfx), Seq("g"), numBuckets = 4)

  private def answer(t: KeyedTable, k: Int): Set[(String, String, Double, Int)] =
    TopKDelta.topK(t.current, Seq("g"), Seq("id"), "sc", k).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getInt(3))).toSet

  // a's full domain (8 items, saturates m=4), b small (2 items, unsaturated)
  private val base = facts(
    ("a", "a1", 80), ("a", "a2", 70), ("a", "a3", 60), ("a", "a4", 50),
    ("a", "a5", 40), ("a", "a6", 30), ("a", "a7", 20), ("a", "a8", 10),
    ("b", "b1", 5), ("b", "b2", 4))

  test("bootstrap: buffer holds top b*k; answer is top-k; small groups never saturate") {
    val t = mkState("tk")
    TopKDelta.bootstrap(t, base, Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2)
    assert(t.current.count() == 6) // 4 buffered for a, all 2 of b
    assert(answer(t, 2) == Set(("a", "a1", 80.0, 1), ("a", "a2", 70.0, 2),
      ("b", "b1", 5.0, 1), ("b", "b2", 4.0, 2)))
  }

  test("inserts, in-group score updates, and group moves maintain the answer") {
    val t = mkState("tk2")
    TopKDelta.bootstrap(t, base, Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2)
    // b3 inserted on top of b; a2 re-scored down; a3 moves a→b
    val batch = ev(
      ("b", "b3", 99.0, null, null, "I"),
      ("a", "a2", 15.0, "a", 70.0, "U"),
      ("b", "a3", 60.0, "a", 60.0, "U"))
    TopKDelta.maintain(t, batch, sys.error("no refill expected"),
      Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2, batchId = Some("e1"))
    assert(answer(t, 2) == Set(("a", "a1", 80.0, 1), ("a", "a4", 50.0, 2),
      ("b", "b3", 99.0, 1), ("b", "a3", 60.0, 2)))
  }

  test("saturated group: deletes inside the buffer trigger a refill that restores exactness") {
    val t = mkState("tk3")
    TopKDelta.bootstrap(t, base, Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2)
    // kill a1..a3 — buffer guarantee m - dret = 4-3 = 1 < k → refill from facts
    val afterFacts = facts(
      ("a", "a4", 50), ("a", "a5", 40), ("a", "a6", 30), ("a", "a7", 20), ("a", "a8", 10),
      ("b", "b1", 5), ("b", "b2", 4))
    TopKDelta.maintain(t, ev(
      (null, "a1", null, "a", 80.0, "D"),
      (null, "a2", null, "a", 70.0, "D"),
      (null, "a3", null, "a", 60.0, "D")),
      afterFacts, Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2, batchId = Some("e1"))
    // a5 was NEVER in the buffer — only a refill can have found it
    assert(answer(t, 2) == Set(("a", "a4", 50.0, 1), ("a", "a5", 40.0, 2),
      ("b", "b1", 5.0, 1), ("b", "b2", 4.0, 2)))
    // refill reset the meter: the refreshed buffer absorbs the next delete
    TopKDelta.maintain(t, ev((null, "a4", null, "a", 50.0, "D")),
      sys.error("refill meter should have reset"),
      Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2, batchId = Some("e2"))
    assert(answer(t, 2) == Set(("a", "a5", 40.0, 1), ("a", "a6", 30.0, 2),
      ("b", "b1", 5.0, 1), ("b", "b2", 4.0, 2)))
  }

  test("saturated buffer fully emptied in one batch still refills (group must not vanish)") {
    val t = mkState("tk4")
    TopKDelta.bootstrap(t, base, Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2)
    val afterFacts = facts(
      ("a", "a5", 40), ("a", "a6", 30), ("a", "a7", 20), ("a", "a8", 10),
      ("b", "b1", 5), ("b", "b2", 4))
    TopKDelta.maintain(t, ev(
      (null, "a1", null, "a", 80.0, "D"), (null, "a2", null, "a", 70.0, "D"),
      (null, "a3", null, "a", 60.0, "D"), (null, "a4", null, "a", 50.0, "D")),
      afterFacts, Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2, batchId = Some("e1"))
    assert(answer(t, 2) == Set(("a", "a5", 40.0, 1), ("a", "a6", 30.0, 2),
      ("b", "b1", 5.0, 1), ("b", "b2", 4.0, 2)))
  }

  test("unsaturated group delete: no refill, exact from the buffer; group can empty out") {
    val t = mkState("tk5")
    TopKDelta.bootstrap(t, base, Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2)
    TopKDelta.maintain(t, ev(
      (null, "b1", null, "b", 5.0, "D"), (null, "b2", null, "b", 4.0, "D")),
      sys.error("unsaturated groups never refill"),
      Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2, batchId = Some("e1"))
    assert(answer(t, 2).filter(_._1 == "b").isEmpty)
    assert(answer(t, 2) == Set(("a", "a1", 80.0, 1), ("a", "a2", 70.0, 2)))
  }

  test("I for an already-buffered item fails loudly instead of duplicating the answer") {
    val t = mkState("tk7")
    TopKDelta.bootstrap(t, base, Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2)
    val e = intercept[IllegalStateException] {
      TopKDelta.maintain(t, ev(("b", "b1", 9.0, null, null, "I")),
        base, Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2)
    }
    assert(e.getMessage.contains("already-buffered"))
    assert(answer(t, 2) == Set(("a", "a1", 80.0, 1), ("a", "a2", 70.0, 2),
      ("b", "b1", 5.0, 1), ("b", "b2", 4.0, 2)))
  }

  test("groups entering a batch unsaturated restart the retraction meter (no premature refill)") {
    val s = spark
    import s.implicits._
    val t = mkState("tk8")
    // m=4: three items — unsaturated
    TopKDelta.bootstrap(t, facts(("c", "c1", 30), ("c", "c2", 20), ("c", "c3", 10)),
      Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2)
    // batch 1: one buffered delete + two inserts — still unsaturated, meter 0
    TopKDelta.maintain(t, ev(
      (null, "c1", null, "c", 30.0, "D"),
      ("c", "c4", 8.0, null, null, "I"), ("c", "c5", 6.0, null, null, "I")),
      sys.error("unsaturated: no refill"),
      Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2, batchId = Some("e1"))
    // batch 2: saturate from a fully-covered candidate — meter restarts at 0
    TopKDelta.maintain(t, ev(("c", "c6", 4.0, null, null, "I")),
      sys.error("fresh saturation: exact top-m, no refill"),
      Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2, batchId = Some("e2"))
    // batch 3: two buffered deletes — guarantee m-2=2 >= k holds ONLY if the
    // meter restarted; stale accumulation from batch 1 would force a refill
    TopKDelta.maintain(t, ev(
      (null, "c2", null, "c", 20.0, "D"), (null, "c3", null, "c", 10.0, "D")),
      sys.error("meter must have restarted at saturation"),
      Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2, batchId = Some("e3"))
    assert(answer(t, 2) == Set(("c", "c4", 8.0, 1), ("c", "c5", 6.0, 2)))
  }

  test("retraction missing its row in an unsaturated buffer fails loudly; redelivery no-ops") {
    val t = mkState("tk6")
    TopKDelta.bootstrap(t, base, Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2)
    val e = intercept[IllegalStateException] {
      TopKDelta.maintain(t, ev((null, "ghost", null, "b", 1.0, "D")),
        base, Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2)
    }
    assert(e.getMessage.contains("diverged"))
    // saturated group: a miss is legitimate (item lived outside the buffer)
    TopKDelta.maintain(t, ev((null, "a8", null, "a", 10.0, "D")),
      sys.error("guarantee 4-1 >= 2, no refill"),
      Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2, batchId = Some("e1"))
    val v = t.currentVersion
    TopKDelta.maintain(t, ev((null, "a8", null, "a", 10.0, "D")),
      sys.error("redelivered epoch must no-op"),
      Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2, batchId = Some("e1"))
    assert(t.currentVersion == v)
    assert(answer(t, 2) == Set(("a", "a1", 80.0, 1), ("a", "a2", 70.0, 2),
      ("b", "b1", 5.0, 1), ("b", "b2", 4.0, 2)))
  }

  test("group-keyed fact replica: refill never scans the fact table, prunes by group, matches the twin") {
    val s = spark
    import s.implicits._
    val t = mkState("tkrep")
    val twin = mkState("tkrep2")
    // the replica: keyed (g, id), RANGE-routed on g — the refill-cliff fix
    val replica = KeyedTable(spark, tmpDir("tkrep-r"), Seq("g", "id"),
      numBuckets = 4, rangeCol = Some("g"))
    TopKDelta.replicaBootstrap(replica, base, Seq("g"), Seq("id"), "sc")
    TopKDelta.bootstrap(t, base, Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2)
    TopKDelta.bootstrap(twin, base, Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2)
    // range routing separates the groups — a one-group probe opens a
    // different (pruned) bucket set, the property the replica exists for
    val bsA = replica.bucketsOf(Seq("a").toDF("g")).get
    val bsB = replica.bucketsOf(Seq("b").toDF("g")).get
    assert(bsA.toSet != bsB.toSet, s"group routing must separate groups: a=$bsA b=$bsB")
    // epoch 1 — insert + re-score + GROUP MOVE; replica maintained in-epoch
    val e1 = ev(("b", "b3", 99.0, null, null, "I"),
      ("a", "a2", 15.0, "a", 70.0, "U"),
      ("b", "a3", 60.0, "a", 60.0, "U"))
    TopKDelta.maintain(t, e1, sys.error("no refill in e1"), Seq("g"), Seq("id"), "sc",
      k = 2, bufferFactor = 2, batchId = Some("e1"), factsReplica = Some(replica))
    TopKDelta.maintain(twin, e1, sys.error("no refill in e1"), Seq("g"), Seq("id"), "sc",
      k = 2, bufferFactor = 2, batchId = Some("e1"))
    // the move landed: a3 now lives under b in the replica, not a
    val a3Rows = replica.current.filter($"id" === "a3").collect()
    assert(a3Rows.map(_.getString(0)).toSeq == Seq("b"), a3Rows.mkString(","))
    // epoch 2 — delete erodes a's guarantee below k → refill. The facts
    // thunk is sys.error: with the replica present, EVALUATING it would
    // mean the refill touched the item-keyed fact table
    val e2 = ev((null, "a1", null, "a", 80.0, "D"))
    TopKDelta.maintain(t, e2, sys.error("replica refill must not read the fact table"),
      Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2, batchId = Some("e2"),
      factsReplica = Some(replica))
    // the twin refills the classic way, from post-apply facts
    val postFacts = facts(
      ("a", "a2", 15), ("a", "a4", 50), ("a", "a5", 40), ("a", "a6", 30),
      ("a", "a7", 20), ("a", "a8", 10),
      ("b", "b1", 5), ("b", "b2", 4), ("b", "b3", 99), ("b", "a3", 60))
    TopKDelta.maintain(twin, e2, postFacts, Seq("g"), Seq("id"), "sc",
      k = 2, bufferFactor = 2, batchId = Some("e2"))
    assert(answer(t, 2) == answer(twin, 2))
    // a5 was never buffered — only a (replica-sourced) refill finds it
    assert(answer(t, 2) == Set(("a", "a4", 50.0, 1), ("a", "a5", 40.0, 2),
      ("b", "b3", 99.0, 1), ("b", "a3", 60.0, 2)))
    // redelivered epoch no-ops state AND replica
    val (vs, vr) = (t.currentVersion, replica.currentVersion)
    TopKDelta.maintain(t, e2, sys.error("redelivered epoch must no-op"),
      Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2, batchId = Some("e2"),
      factsReplica = Some(replica))
    assert(t.currentVersion == vs && replica.currentVersion == vr)
    // shape contract fails loudly: hash-routed replica can't answer group probes
    val bad = KeyedTable(spark, tmpDir("tkrep-bad"), Seq("g", "id"), numBuckets = 4)
    val err = intercept[IllegalArgumentException] {
      TopKDelta.replicaBootstrap(bad, base, Seq("g"), Seq("id"), "sc")
    }
    assert(err.getMessage.contains("range-bucketed"))
  }

  test("malformed batch fails BEFORE the replica commits; the corrected redelivery applies") {
    // r10 ADVICE: replicaMaintain used to commit the replica (tagged with
    // batchId) before maintain's batch-validity checks ran — a malformed
    // batch durably corrupted the replica, and the CORRECTED batch
    // redelivered under the same batchId then no-op'd it via lastTag,
    // silently diverging replica from facts and poisoning future refills.
    val s = spark
    import s.implicits._
    val t = mkState("tkval")
    val replica = KeyedTable(spark, tmpDir("tkval-r"), Seq("g", "id"),
      numBuckets = 4, rangeCol = Some("g"))
    TopKDelta.replicaBootstrap(replica, base, Seq("g"), Seq("id"), "sc")
    TopKDelta.bootstrap(t, base, Seq("g"), Seq("id"), "sc", k = 2, bufferFactor = 2)
    val (vs, vr) = (t.currentVersion, replica.currentVersion)
    // two events for one item in one batch — violates the one-event contract
    val badBatch = ev(("a", "a2", 71.0, "a", 70.0, "U"),
      ("a", "a2", 72.0, "a", 71.0, "U"))
    val e = intercept[Exception] {
      TopKDelta.maintain(t, badBatch, sys.error("no refill"), Seq("g"), Seq("id"),
        "sc", k = 2, bufferFactor = 2, batchId = Some("e1"),
        factsReplica = Some(replica))
    }
    assert(e.getMessage.contains("one event per item"))
    assert(replica.currentVersion == vr, "replica must not commit a malformed batch")
    assert(t.currentVersion == vs)
    // the corrected batch under the SAME batchId applies to BOTH tables
    TopKDelta.maintain(t, ev(("a", "a2", 71.0, "a", 70.0, "U")),
      sys.error("no refill"), Seq("g"), Seq("id"), "sc",
      k = 2, bufferFactor = 2, batchId = Some("e1"), factsReplica = Some(replica))
    assert(replica.current.filter($"id" === "a2").head().getAs[Double]("sc") == 71.0)
    assert(answer(t, 2) == Set(("a", "a1", 80.0, 1), ("a", "a2", 71.0, 2),
      ("b", "b1", 5.0, 1), ("b", "b2", 4.0, 2)))
  }
}
