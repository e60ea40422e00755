package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ChainSpec extends SparkSpec {

  // facts (fid, dref, m) ⋈ dims (did, seg): view keyed fid; downstream is
  // the AggDelta count-per-seg view maintained from the emitted change feed
  private def mk(pfx: String) = {
    val d = tmpDir(pfx)
    (KeyedTable(spark, s"$d/fact", Seq("fid"), numBuckets = 4),
      KeyedTable(spark, s"$d/dim", Seq("did"), numBuckets = 2),
      KeyedTable(spark, s"$d/view", Seq("fid"), numBuckets = 4),
      KeyedTable(spark, s"$d/index", Seq("dref", "fid"), numBuckets = 4,
        rangeCol = Some("dref")),
      Chain.changeLog(spark, s"$d/log", Seq("fid")),
      KeyedTable(spark, s"$d/agg", Seq("seg"), numBuckets = 2))
  }

  private def facts(rows: (String, String, Int)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("fid", "dref", "m")
  }

  private def dims(rows: (String, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("did", "seg")
  }

  private def fd(rows: (String, String, Int, String, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("fid", "dref", "m", "_old_dref", "_op").withColumn("_seq", lit(1))
  }

  private def boot() = {
    val (f, dm, v, ix, log, agg) = mk("chain")
    f.overwrite(facts(("f1", "d1", 10), ("f2", "d1", 20), ("f3", "d2", 30)))
    dm.overwrite(dims(("d1", "A"), ("d2", "B")))
    JoinDelta.bootstrap(v, ix, f.current, dm.current, "dref", "did")
    AggDelta.bootstrap(agg, v.current, Seq("seg"), Nil)
    (f, dm, v, ix, log, agg)
  }

  private def aggRows(agg: KeyedTable): Map[String, Long] =
    agg.current.collect().map(r => r.getAs[String]("seg") -> r.getAs[Long]("cnt")).toMap

  private def segRecompute(v: KeyedTable): Map[String, Long] =
    v.current.groupBy("seg").count().collect()
      .map(r => r.getAs[String]("seg") -> r.getAs[Long]("count")).toMap

  private def downstream(agg: KeyedTable)(ch: DataFrame, bid: String): Unit =
    AggDelta.maintain(agg, ch, Seq("seg"), Nil, batchId = Some(bid))

  test("happy path: epoch applies upstream then downstream from the log; redelivery no-ops") {
    val (f, dm, v, ix, log, agg) = boot()
    // f4 joins seg B; f2 moves d1→d2 (A→B); f3 deleted (B loses one)
    val e1 = fd(("f4", "d2", 40, null, "I"), ("f2", "d2", 21, "d1", "U"),
      ("f3", null, 0, "d2", "D"))
    Chain.epoch(f, dm, v, ix, log, Some(e1), None, "dref", "did", "e1")(downstream(agg))
    assert(aggRows(agg) == segRecompute(v))
    assert(aggRows(agg) == Map("A" -> 1L, "B" -> 2L))
    // full redelivery of the epoch: every table already tagged → no drift
    // (increments are NOT naturally idempotent — the tags are load-bearing)
    Chain.epoch(f, dm, v, ix, log, Some(e1), None, "dref", "did", "e1")(downstream(agg))
    assert(aggRows(agg) == Map("A" -> 1L, "B" -> 2L))
  }

  test("crash between view commit and downstream apply: resume completes the chain") {
    val (f, dm, v, ix, log, agg) = boot()
    val e1 = fd(("f4", "d2", 40, null, "I"), ("f2", "d2", 21, "d1", "U"))
    // the applier dies AFTER maintain returned — the view is committed, the
    // downstream is not: exactly the window that silently lost the link
    // before the log existed
    intercept[RuntimeException] {
      Chain.epoch(f, dm, v, ix, log, Some(e1), None, "dref", "did", "e1") {
        (_, _) => throw new RuntimeException("crash before downstream apply")
      }
    }
    assert(v.lastTag.contains("e1"), "view must be committed at the crash point")
    assert(!agg.lastTag.contains("e1"), "downstream must be behind at the crash point")
    assert(aggRows(agg) != segRecompute(v), "chain is visibly broken mid-epoch")
    // resume with the same batchId: maintain no-ops (view tag), but the
    // WRITE-AHEAD log still holds the epoch's emission — downstream catches up
    Chain.epoch(f, dm, v, ix, log, Some(e1), None, "dref", "did", "e1")(downstream(agg))
    assert(aggRows(agg) == segRecompute(v))
    assert(aggRows(agg) == Map("A" -> 1L, "B" -> 3L))
  }

  test("log accumulates epochs; prune drops acknowledged ones") {
    val (f, dm, v, ix, log, agg) = boot()
    Chain.epoch(f, dm, v, ix, log, Some(fd(("f4", "d2", 40, null, "I"))), None,
      "dref", "did", "e1")(downstream(agg))
    Chain.epoch(f, dm, v, ix, log, Some(fd(("f5", "d1", 50, null, "I"))), None,
      "dref", "did", "e2")(downstream(agg))
    assert(Chain.emitted(log, "e1").count() == 1)
    assert(Chain.emitted(log, "e2").count() == 1)
    assert(aggRows(agg) == segRecompute(v))
    Chain.prune(log, keepEpochs = Set("e2"))
    assert(Chain.emitted(log, "e1").count() == 0)
    assert(Chain.emitted(log, "e2").count() == 1)
  }

  test("pruneAcked computes the safe set from consumer acks — keeps exactly the unacked suffix") {
    val (f, dm, v, ix, log, agg) = boot()
    // consumer "agg" acks through Chain.epoch's consumer param
    Chain.epoch(f, dm, v, ix, log, Some(fd(("f4", "d2", 40, null, "I"))), None,
      "dref", "did", "e1", consumer = Some("agg"))(downstream(agg))
    Chain.epoch(f, dm, v, ix, log, Some(fd(("f5", "d1", 50, null, "I"))), None,
      "dref", "did", "e2", consumer = Some("agg"))(downstream(agg))
    // a second, LAGGING consumer has only applied e1
    Chain.registerConsumer(log, "audit")
    Chain.ack(log, "audit", "e1")
    Chain.pruneAcked(log)
    // e1 acked by both → dropped; e2 acked only by "agg" → kept, even
    // though the caller never had to name it
    assert(Chain.emitted(log, "e1").count() == 0)
    assert(Chain.emitted(log, "e2").count() == 1)
    // the laggard catches up → e2 becomes safe and goes too
    Chain.ack(log, "audit", "e2")
    Chain.pruneAcked(log)
    assert(Chain.emitted(log, "e2").count() == 0)
    // registrations survive pruning; acks of pruned epochs are retired
    val acks = Chain.ackTable(log).current.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(acks == Set("agg" -> Chain.RegisteredEpoch, "audit" -> Chain.RegisteredEpoch))
  }

  test("ack rejects the reserved sentinel; ackAll acks a consumer fan-out in ONE commit") {
    val (f, dm, v, ix, log, agg) = boot()
    Chain.epoch(f, dm, v, ix, log, Some(fd(("f4", "d2", 40, null, "I"))), None,
      "dref", "did", "e1")(downstream(agg))
    // r10 ADVICE: a real epoch literally named "_registered" would be
    // misread as a registration row — excluded from fullyAcked, its log
    // rows unprunable forever. The name is reserved, loudly.
    val e = intercept[IllegalArgumentException] {
      Chain.ack(log, "rogue", Chain.RegisteredEpoch)
    }
    assert(e.getMessage.contains("reserved"))
    // r10 verdict #4: one ack-table commit per (consumer, epoch) pair makes
    // the commit machinery the chain's dominant overhead once consumers
    // multiply — a fan-out epoch acks every applier in one batched commit
    Seq("c1", "c2", "c3").foreach(Chain.registerConsumer(log, _))
    val acks = Chain.ackTable(log)
    val v0 = acks.currentVersion
    Chain.ackAll(log, Seq("c1", "c2", "c3"), "e1")
    assert(acks.currentVersion == v0 + 1, "one commit for the whole fan-out")
    // the batched acks count toward pruneAcked's safe set like singles
    Chain.pruneAcked(log)
    assert(Chain.emitted(log, "e1").count() == 0)
  }

  test("pruneAcked refuses to run with no registered consumers") {
    val (f, dm, v, ix, log, agg) = boot()
    Chain.epoch(f, dm, v, ix, log, Some(fd(("f4", "d2", 40, null, "I"))), None,
      "dref", "did", "e1")(downstream(agg))
    val e = intercept[IllegalArgumentException] { Chain.pruneAcked(log) }
    assert(e.getMessage.contains("no consumers registered"))
    assert(Chain.emitted(log, "e1").count() == 1, "refusal must not prune anything")
  }
}
