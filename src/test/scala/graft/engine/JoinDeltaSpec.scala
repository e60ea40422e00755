package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class JoinDeltaSpec extends SparkSpec {

  // facts (fid, dref, m) ⋈ dims (did, name): view keyed fid, index (dref, fid)
  private def mk(pfx: String): (KeyedTable, KeyedTable, KeyedTable, KeyedTable) = {
    val d = tmpDir(pfx)
    (KeyedTable(spark, s"$d/fact", Seq("fid"), numBuckets = 4),
      KeyedTable(spark, s"$d/dim", Seq("did"), numBuckets = 2),
      KeyedTable(spark, s"$d/view", Seq("fid"), numBuckets = 4),
      KeyedTable(spark, s"$d/index", Seq("dref", "fid"), numBuckets = 4,
        rangeCol = Some("dref")))
  }

  private def facts(rows: (String, String, Int)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("fid", "dref", "m")
  }

  private def dims(rows: (String, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("did", "name")
  }

  private def boot(joinType: String = "inner") = {
    val (f, dm, v, ix) = mk("jd")
    f.overwrite(facts(("f1", "d1", 10), ("f2", "d1", 20), ("f3", "d2", 30)))
    dm.overwrite(dims(("d1", "one"), ("d2", "two"), ("d3", "three")))
    JoinDelta.bootstrap(v, ix, f.current, dm.current, "dref", "did", joinType)
    (f, dm, v, ix)
  }

  private def viewRows(v: KeyedTable): Set[(String, String, Int, String)] =
    v.current.collect().map(r => (r.getAs[String]("fid"), r.getAs[String]("dref"),
      r.getAs[Int]("m"), r.getAs[String]("name"))).toSet

  private def idxPairs(ix: KeyedTable): Set[(String, String)] =
    ix.current.collect().map(r => (r.getAs[String]("dref"), r.getAs[String]("fid"))).toSet

  private def fd(rows: (String, String, Int, String, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    // (fid, dref, m, _old_dref, _op)
    rows.toSeq.toDF("fid", "dref", "m", "_old_dref", "_op").withColumn("_seq", lit(1))
  }

  private def dd(rows: (String, String, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("did", "name", "_op").withColumn("_seq", lit(1))
  }

  test("bootstrap: view is the join, index is the pair set") {
    val (_, _, v, ix) = boot()
    assert(viewRows(v) == Set(("f1", "d1", 10, "one"), ("f2", "d1", 20, "one"),
      ("f3", "d2", 30, "two")))
    assert(idxPairs(ix) == Set(("d1", "f1"), ("d1", "f2"), ("d2", "f3")))
  }

  test("fact epoch: insert, dim-reference move, delete — view and index both follow") {
    val (f, dm, v, ix) = boot()
    JoinDelta.maintain(f, dm, v, ix, Some(fd(
      ("f4", "d3", 40, null, "I"),
      ("f2", "d2", 21, "d1", "U"), // moves d1 → d2
      ("f3", null, 0, "d2", "D"))), None, "dref", "did", batchId = "e1")
    assert(viewRows(v) == Set(("f1", "d1", 10, "one"), ("f2", "d2", 21, "two"),
      ("f4", "d3", 40, "three")))
    assert(idxPairs(ix) == Set(("d1", "f1"), ("d2", "f2"), ("d3", "f4")))
    assert(f.current.count() == 3)
  }

  test("dim epoch: update reaches exactly the referencing facts; inner delete cascades") {
    val (f, dm, v, ix) = boot()
    JoinDelta.maintain(f, dm, v, ix, None, Some(dd(
      ("d1", "ONE", "U"), ("d2", null, "D"))), "dref", "did", batchId = "e1")
    assert(viewRows(v) == Set(("f1", "d1", 10, "ONE"), ("f2", "d1", 20, "ONE")))
    assert(idxPairs(ix) == Set(("d1", "f1"), ("d1", "f2"), ("d2", "f3"))) // index tracks facts, not dims
  }

  test("left join: dim delete nulls the payload instead of cascading the row away") {
    val (f, dm, v, ix) = boot(joinType = "left")
    JoinDelta.maintain(f, dm, v, ix, None, Some(dd(("d2", null, "D"))),
      "dref", "did", batchId = "e1", joinType = "left")
    assert(viewRows(v) == Set(("f1", "d1", 10, "one"), ("f2", "d1", 20, "one"),
      ("f3", "d2", 30, null)))
  }

  test("combined epoch: both sides in one batchId") {
    val (f, dm, v, ix) = boot()
    JoinDelta.maintain(f, dm, v, ix,
      Some(fd(("f1", "d2", 11, "d1", "U"))),
      Some(dd(("d1", "ONE", "U"))), "dref", "did", batchId = "e1")
    assert(viewRows(v) == Set(("f1", "d2", 11, "two"), ("f2", "d1", 20, "ONE"),
      ("f3", "d2", 30, "two")))
    assert(idxPairs(ix) == Set(("d2", "f1"), ("d1", "f2"), ("d2", "f3")))
  }

  test("redelivered epoch no-ops everywhere; partially-applied epoch resumes") {
    val (f, dm, v, ix) = boot()
    val delta = fd(("f2", "d2", 21, "d1", "U"))
    JoinDelta.maintain(f, dm, v, ix, Some(delta), None, "dref", "did", batchId = "e1")
    val versions = (f.currentVersion, dm.currentVersion, v.currentVersion, ix.currentVersion)
    JoinDelta.maintain(f, dm, v, ix, Some(delta), None, "dref", "did", batchId = "e1")
    assert((f.currentVersion, dm.currentVersion, v.currentVersion, ix.currentVersion) == versions)

    // crash window: fact table applied and tagged, rest not — resume must
    // skip the fact apply (tag) and still complete index + view
    val delta2 = fd(("f1", "d3", 12, "d1", "U"))
    f.mergeCdc(delta2, tag = Some("e2"))
    JoinDelta.maintain(f, dm, v, ix, Some(delta2), None, "dref", "did", batchId = "e2")
    assert(viewRows(v) == Set(("f1", "d3", 12, "three"), ("f2", "d2", 21, "two"),
      ("f3", "d2", 30, "two")))
    assert(idxPairs(ix) == Set(("d3", "f1"), ("d2", "f2"), ("d2", "f3")))
  }

  test("two events for one key in an epoch fail in-plan; missing before-image fails") {
    val (f, dm, v, ix) = boot()
    val e1 = intercept[Exception] {
      JoinDelta.maintain(f, dm, v, ix, Some(fd(
        ("f1", "d2", 11, "d1", "U"), ("f1", "d3", 12, "d2", "U"))),
        None, "dref", "did", batchId = "e1")
    }
    assert(e1.getMessage.contains("one event per key"))
    val e2 = intercept[Exception] {
      JoinDelta.maintain(f, dm, v, ix, Some(fd(("f1", "d2", 11, null, "U"))),
        None, "dref", "did", batchId = "e2")
    }
    assert(e2.getMessage.contains("before-image"))
    // failed epochs committed nothing
    assert(viewRows(v) == Set(("f1", "d1", 10, "one"), ("f2", "d1", 20, "one"),
      ("f3", "d2", 30, "two")))
  }

  test("emitChanges: the view's own op-coded delta, images intact, no-ops suppressed") {
    val (f, dm, v, ix) = boot()
    // f4 appears (I), f3 vanishes (D), f2 moves dim (U); f1 untouched
    val ch = JoinDelta.maintain(f, dm, v, ix, Some(fd(
      ("f4", "d3", 40, null, "I"),
      ("f2", "d2", 21, "d1", "U"),
      ("f3", null, 0, "d2", "D"))), None, "dref", "did", batchId = "e1",
      emitChanges = true).get
    val got = ch.collect().map(r => r.getAs[String]("fid") -> (
      r.getAs[String]("_op"), r.getAs[String]("dref"), r.getAs[String]("name"),
      r.getAs[String]("_old_dref"), r.getAs[String]("_old_name"))).toMap
    assert(got == Map(
      "f4" -> (("I", "d3", "three", null, null)),
      "f2" -> (("U", "d2", "two", "d1", "one")),
      "f3" -> (("D", null, null, "d2", "two"))))
    // a dim no-op rewrite (same values) is recomputed but suppressed
    val ch2 = JoinDelta.maintain(f, dm, v, ix, None,
      Some(dd(("d1", "one", "U"))), "dref", "did", batchId = "e2",
      emitChanges = true).get
    assert(ch2.isEmpty)
    // feeding the emission into AggDelta keeps a per-dim-name count true
    val agg = KeyedTable(spark, tmpDir("jd-agg"), Seq("name"), numBuckets = 2)
    AggDelta.bootstrap(agg, dims(("one", "x"), ("one", "y"), ("two", "z"))
      .toDF("name", "ignore"), Seq("name"), Nil)
    AggDelta.maintain(agg, ch, Seq("name"), Nil, batchId = Some("e1"))
    val counts = agg.current.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // started one=2, two=1; I(three)+1, U one→two, D two-1 → one=1, two=1, three=1
    assert(counts == Map("one" -> 1L, "two" -> 1L, "three" -> 1L))
  }

  test("snowflake: a second JoinDelta consumes the first view's emitted feed") {
    val s = spark
    import s.implicits._
    val (f, dm, v, ix) = boot() // v = facts ⋈ dims (fid, dref, m, name)
    // second hop: v ⋈ regions on name; v2 keyed fid with its own index
    val d2 = tmpDir("jd-snow")
    val regions = KeyedTable(spark, s"$d2/dim2", Seq("rname"), numBuckets = 2)
    regions.overwrite(Seq(("one", "north"), ("two", "south"), ("three", "east"))
      .toDF("rname", "region"))
    val v2 = KeyedTable(spark, s"$d2/view2", Seq("fid"), numBuckets = 4)
    val ix2 = KeyedTable(spark, s"$d2/index2", Seq("name", "fid"), numBuckets = 4,
      rangeCol = Some("name"))
    JoinDelta.bootstrap(v2, ix2, v.current, regions.current, "name", "rname")

    // one upstream epoch: insert f4(d3), move f2 d1→d2, delete f3
    val ch = JoinDelta.maintain(f, dm, v, ix, Some(fd(
      ("f4", "d3", 40, null, "I"),
      ("f2", "d2", 21, "d1", "U"),
      ("f3", null, 0, "d2", "D"))), None, "dref", "did", batchId = "e1",
      emitChanges = true).get
    // the emitted feed IS a valid fact delta for the second hop — it just
    // needs a sequence column (one event per key, so a constant works)
    JoinDelta.maintain(v, regions, v2, ix2,
      Some(ch.withColumn("_seq", lit(1))), None, "name", "rname", batchId = "e1")
    val got = v2.current.collect().map(r => (r.getAs[String]("fid"),
      r.getAs[String]("name"), r.getAs[String]("region"))).toSet
    assert(got == Set(("f1", "one", "north"), ("f2", "two", "south"),
      ("f4", "three", "east")))
    // and the whole two-hop chain equals a from-scratch double join
    val scratch = JoinDelta.viewPlan(v.current, regions.current, "name", "rname", "inner")
    assert(v2.current.exceptAll(scratch).count() == 0 &&
      scratch.exceptAll(v2.current).count() == 0)
  }

  test("nullableRef left join: NULL dim refs flow through the view, never the index") {
    // r10 ADVICE (medium): a left-join fact with a NULL dim reference put
    // (NULL, fk) into the index's replaceKeys call, which hard-failed the
    // whole epoch with the misleading covered-keys error. NULL-ref pairs
    // are now excluded from the index on both sides (a NULL ref matches no
    // dim, so the pair is unprobeable dead weight), and nullableRef=true
    // reads a NULL old image as "the old ref WAS null".
    val (fT, dm, v, ix) = mk("jd-null")
    fT.overwrite(facts(("f1", "d1", 10), ("f2", null, 20)))
    dm.overwrite(dims(("d1", "one"), ("d2", "two")))
    JoinDelta.bootstrap(v, ix, fT.current, dm.current, "dref", "did", "left")
    assert(idxPairs(ix) == Set(("d1", "f1")), "bootstrap excludes NULL-ref pairs")
    assert(viewRows(v) == Set(("f1", "d1", 10, "one"), ("f2", null, 20, null)))
    // one epoch: insert a null-ref fact, move f2 NULL→d2 (null old image),
    // move f1 d1→NULL — every transition involving a null ref in one batch
    JoinDelta.maintain(fT, dm, v, ix, Some(fd(
      ("f3", null, 30, null, "I"),
      ("f2", "d2", 21, null, "U"),
      ("f1", null, 11, "d1", "U"))), None, "dref", "did", batchId = "e1",
      joinType = "left", nullableRef = true)
    assert(viewRows(v) == Set(("f1", null, 11, null), ("f2", "d2", 21, "two"),
      ("f3", null, 30, null)))
    assert(idxPairs(ix) == Set(("d2", "f2")), "index tracks only non-null refs")
    // a dim epoch still reaches exactly the referencing facts
    JoinDelta.maintain(fT, dm, v, ix, None, Some(dd(("d2", "TWO", "U"))),
      "dref", "did", batchId = "e2", joinType = "left", nullableRef = true)
    assert(viewRows(v) == Set(("f1", null, 11, null), ("f2", "d2", 21, "TWO"),
      ("f3", null, 30, null)))
    // the whole maintained view equals a from-scratch left join
    val scratch = JoinDelta.viewPlan(fT.current, dm.current, "dref", "did", "left")
    assert(v.current.exceptAll(scratch).count() == 0 &&
      scratch.exceptAll(v.current).count() == 0)
    // strict mode (default) still traps a missing before-image loudly
    val e = intercept[Exception] {
      JoinDelta.maintain(fT, dm, v, ix, Some(fd(("f2", "d1", 22, null, "U"))),
        None, "dref", "did", batchId = "e3", joinType = "left")
    }
    assert(e.getMessage.contains("before-image"))
  }

  test("dim probe resolves affected facts through pruned index buckets") {
    val (f, dm, v, ix) = boot()
    // the probe frame carries only the rangeCol — bucketsOf must resolve
    val s = spark
    import s.implicits._
    val dks = Seq("d1").toDF("dref")
    val bs = ix.bucketsOf(dks)
    assert(bs.isDefined && bs.get.nonEmpty && bs.get.size < 4)
    val rows = ix.readBuckets(bs.get)
      .join(broadcast(dks), Seq("dref"), "left_semi").collect()
    assert(rows.map(_.getAs[String]("fid")).toSet == Set("f1", "f2"))
  }
}
