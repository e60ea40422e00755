package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {

  private def hist(root: String) =
    KeyedTable(spark, root, Seq("id"), numBuckets = 4)

  private def rows(t: KeyedTable): Set[(String, String, Long, Option[Long], Boolean)] =
    t.current.collect().map { r =>
      (r.getAs[String]("id"), r.getAs[String]("v"),
        r.getAs[Long]("valid_from"),
        Option(r.getAs[java.lang.Long]("valid_to")).map(_.longValue()),
        r.getAs[Boolean]("is_current"))
    }.toSet

  private def batch(evs: (String, String, String, Int)*) = {
    val s = spark
    import s.implicits._
    evs.toSeq.toDF("id", "v", "_op", "_seq")
  }

  test("update closes the open row and opens a new one; delete closes; insert opens") {
    val s = spark
    import s.implicits._
    val t = hist(tmpDir("scd2"))
    Scd2.bootstrap(t, Seq(("a", "a0"), ("b", "b0")).toDF("id", "v"), seq0 = 0L)
    assert(rows(t) == Set(("a", "a0", 0L, None, true), ("b", "b0", 0L, None, true)))

    Scd2.maintain(t, batch(("a", "a1", "U", 5), ("b", null, "D", 6), ("c", "c0", "I", 7)))
    assert(rows(t) == Set(
      ("a", "a0", 0L, Some(5L), false), ("a", "a1", 5L, None, true),
      ("b", "b0", 0L, Some(6L), false),
      ("c", "c0", 7L, None, true)))
  }

  test("in-batch chains: I→U→D leaves only closed intervals; D→I re-opens across the gap") {
    val s = spark
    import s.implicits._
    val t = hist(tmpDir("scd2c"))
    Scd2.bootstrap(t, Seq(("g", "g0")).toDF("id", "v"))
    // new key x: I@1 → U@2 → D@4 — two closed rows, no open row
    // existing g: D@3 → I@6 — closed [0,3), gap [3,6), open from 6
    Scd2.maintain(t, batch(
      ("x", "x0", "I", 1), ("x", "x1", "U", 2), ("x", null, "D", 4),
      ("g", null, "D", 3), ("g", "g1", "I", 6)))
    assert(rows(t) == Set(
      ("x", "x0", 1L, Some(2L), false), ("x", "x1", 2L, Some(4L), false),
      ("g", "g0", 0L, Some(3L), false), ("g", "g1", 6L, None, true)))
  }

  test("I on an open row behaves like U; D for an absent key is a no-op") {
    val s = spark
    import s.implicits._
    val t = hist(tmpDir("scd2i"))
    Scd2.bootstrap(t, Seq(("a", "a0")).toDF("id", "v"))
    Scd2.maintain(t, batch(("a", "a1", "I", 2), ("ghost", null, "D", 3)))
    assert(rows(t) == Set(
      ("a", "a0", 0L, Some(2L), false), ("a", "a1", 2L, None, true)))
  }

  test("untouched keys' history passes through and closed rows are immutable") {
    val s = spark
    import s.implicits._
    val t = hist(tmpDir("scd2u"))
    Scd2.bootstrap(t, Seq(("a", "a0"), ("b", "b0")).toDF("id", "v"))
    Scd2.maintain(t, batch(("a", "a1", "U", 1)))
    Scd2.maintain(t, batch(("a", "a2", "U", 2)))
    assert(rows(t) == Set(
      ("a", "a0", 0L, Some(1L), false), ("a", "a1", 1L, Some(2L), false),
      ("a", "a2", 2L, None, true),
      ("b", "b0", 0L, None, true)))
  }

  test("out-of-order event (at or before the recorded boundary) fails loudly") {
    val s = spark
    import s.implicits._
    val t = hist(tmpDir("scd2o"))
    Scd2.bootstrap(t, Seq(("a", "a0")).toDF("id", "v"), seq0 = 10L)
    val e1 = intercept[Exception] { Scd2.maintain(t, batch(("a", "a1", "U", 10))) }
    assert(e1.getMessage.contains("out-of-order"))
    // also against a CLOSED boundary: close a, then event inside the gap
    Scd2.maintain(t, batch(("a", null, "D", 20)))
    val e2 = intercept[Exception] { Scd2.maintain(t, batch(("a", "a2", "I", 15))) }
    assert(e2.getMessage.contains("out-of-order"))
    // and the boundary itself is excluded (strict >): seq 20 also fails
    val e3 = intercept[Exception] { Scd2.maintain(t, batch(("a", "a2", "I", 20))) }
    assert(e3.getMessage.contains("out-of-order"))
    // strictly after it is fine (re-open)
    Scd2.maintain(t, batch(("a", "a2", "I", 21)))
    assert(rows(t) == Set(
      ("a", "a0", 10L, Some(20L), false), ("a", "a2", 21L, None, true)))
  }

  test("two surviving events at one (key, seq) are ambiguous and fail; unknown op fails") {
    val s = spark
    import s.implicits._
    val t = hist(tmpDir("scd2d"))
    Scd2.bootstrap(t, Seq(("a", "a0")).toDF("id", "v"))
    val e = intercept[Exception] {
      Scd2.maintain(t, batch(("a", "a1", "U", 3), ("a", "a2", "U", 3)))
    }
    assert(e.getMessage.contains("duplicate sequence"))
    val e2 = intercept[Exception] { Scd2.maintain(t, batch(("a", "a1", "X", 4))) }
    assert(e2.getMessage.contains("must be I/U/D"))
    // failed applies must not have committed anything
    assert(rows(t) == Set(("a", "a0", 0L, None, true)))
  }

  test("batchId tag: redelivered batch no-ops instead of erroring out-of-order") {
    val s = spark
    import s.implicits._
    val t = hist(tmpDir("scd2t"))
    Scd2.bootstrap(t, Seq(("a", "a0")).toDF("id", "v"))
    val b = batch(("a", "a1", "U", 4))
    val v1 = Scd2.maintain(t, b, batchId = Some("b-1"))
    val v2 = Scd2.maintain(t, b, batchId = Some("b-1")) // foreachBatch retry
    assert(v1 == v2 && t.currentVersion == v1)
    assert(rows(t) == Set(("a", "a0", 0L, Some(4L), false), ("a", "a1", 4L, None, true)))
  }

  test("null sequence fails in-plan — never a NULL valid_from invisible to asOf") {
    val s = spark
    import s.implicits._
    val t = hist(tmpDir("scd2n"))
    Scd2.bootstrap(t, Seq(("a", "a0")).toDF("id", "v"))
    val bad = Seq(("zz", "z0", "I", null.asInstanceOf[java.lang.Integer]))
      .toDF("id", "v", "_op", "_seq")
    val e = intercept[Exception] { Scd2.maintain(t, bad) }
    val chain = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("non-null long"), chain)
    assert(rows(t) == Set(("a", "a0", 0L, None, true)))
  }

  test("null natural key fails in-plan — never silent duplicate history rows") {
    val s = spark
    import s.implicits._
    val t = hist(tmpDir("scd2nk"))
    Scd2.bootstrap(t, Seq(("a", "a0")).toDF("id", "v"))
    // a null-keyed event passes seq/op checks, but replaceKeys' null-unsafe
    // key equality never matches its prior rows — each batch would append a
    // fresh duplicate history row for the null key, silently
    val bad = Seq((null.asInstanceOf[String], "z0", "I", 5))
      .toDF("id", "v", "_op", "_seq")
    val e = intercept[Exception] { Scd2.maintain(t, bad) }
    val chain = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    // two in-plan guards cover this since r11 — Scd2's own natural-key
    // check and KeyedTable.replaceKeys' NULL-key rejection; whichever row
    // evaluates first raises, and either message is a correct loud failure
    assert(chain.contains("must be non-null") || chain.contains("NULL key value"), chain)
    assert(rows(t) == Set(("a", "a0", 0L, None, true)))
  }

  test("asOf: covering row per key, from-inclusive to-exclusive, gaps empty") {
    val s = spark
    import s.implicits._
    val t = hist(tmpDir("scd2a"))
    Scd2.bootstrap(t, Seq(("g", "g0")).toDF("id", "v"))
    Scd2.maintain(t, batch(("g", null, "D", 3), ("g", "g1", "I", 6)))
    def at(seq: Long): Set[String] =
      Scd2.asOf(t.current, seq).collect().map(_.getAs[String]("v")).toSet
    assert(at(0) == Set("g0")) // from-inclusive: visible AT its valid_from
    assert(at(2) == Set("g0"))
    assert(at(3) == Set.empty) // to-exclusive: the delete at 3 is in force AT 3
    assert(at(5) == Set.empty) // tombstone gap
    assert(at(6) == Set("g1"))
  }

  test("temporalJoin: probes see the row in force at their own time; gaps drop or null") {
    val s = spark
    import s.implicits._
    val t = hist(tmpDir("scd2tj"))
    Scd2.bootstrap(t, Seq(("g", "g0")).toDF("id", "v"))
    Scd2.maintain(t, batch(("g", "gA", "U", 2), ("g", null, "D", 4), ("g", "gB", "I", 7)))
    // probes at 0..7; probe frame carries a colliding `v` column
    val probes = (0L to 7L).map(i => ("g", i, s"probe$i")).toDF("id", "t", "v")
    val inner = Scd2.temporalJoin(probes, t.current, Seq("id"), "t", "inner")
    val got = inner.collect().map(r =>
      r.getAs[Long]("t") -> r.getAs[String]("hist_v")).toMap
    assert(got == Map(0L -> "g0", 1L -> "g0", 2L -> "gA", 3L -> "gA", 7L -> "gB"))
    // 4,5,6 are the tombstone gap — inner drops them, left keeps them null
    val left = Scd2.temporalJoin(probes, t.current, Seq("id"), "t", "left")
    assert(left.count() == 8)
    assert(left.filter(col("hist_v").isNull).collect()
      .map(_.getAs[Long]("t")).toSet == Set(4L, 5L, 6L))
    // both sides' payload visible under the collision prefix
    assert(inner.columns.contains("v") && inner.columns.contains("hist_v"))
  }

  test("replaceKeys: multi-row groups replaced atomically; empty group disappears") {
    val s = spark
    import s.implicits._
    val t = KeyedTable(spark, tmpDir("rk"), Seq("id"), numBuckets = 4)
    t.overwrite(Seq(("a", 1), ("a", 2), ("b", 1), ("c", 1)).toDF("id", "n"))
    // replace a's group with three rows, drop b entirely, leave c untouched
    val v = t.replaceKeys(
      Seq(("a", 0), ("b", 0)).toDF("id", "n").select(col("id")),
      Seq(("a", 10), ("a", 11), ("a", 12)).toDF("id", "n"))
    assert(v == 2)
    val got = t.current.collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(got == Set(("a", 10), ("a", 11), ("a", 12), ("c", 1)))
  }
}
