package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AuditSpec extends SparkSpec {

  private def table(name: String, rows: Seq[(String, Long, String)]) = {
    val s = spark
    import s.implicits._
    val t = KeyedTable(spark, tmpDir(name), Seq("k"))
    t.overwrite(rows.toDF("k", "cnt", "tag"))
    t
  }

  test("agreeing state audits clean: zero diffs, audit_ok 1, no diff rows") {
    val s = spark
    import s.implicits._
    val rows = Seq(("a", 1L, "x"), ("b", 2L, "y"), ("c", 3L, "z"))
    val t = table("audit1", rows)
    val expected = rows.toDF("k", "cnt", "tag")
    assert(Audit.viewDiff(t, expected, Seq("k")).count() == 0)
    val sum = Audit.viewAudit(t, expected, Seq("k")).collect()(0)
    assert(sum.getLong(sum.fieldIndex("n_view")) == 3L)
    assert(sum.getLong(sum.fieldIndex("n_expected")) == 3L)
    assert(sum.getLong(sum.fieldIndex("n_missing")) == 0L)
    assert(sum.getLong(sum.fieldIndex("n_extra")) == 0L)
    assert(sum.getLong(sum.fieldIndex("n_drift")) == 0L)
    assert(sum.getInt(sum.fieldIndex("audit_ok")) == 1)
  }

  test("each divergence class is found and labeled; agreeing keys stay silent") {
    val s = spark
    import s.implicits._
    // view: a(drift on cnt), b(ok), d(extra); expected: a, b, c(missing)
    val t = table("audit2", Seq(("a", 99L, "x"), ("b", 2L, "y"), ("d", 4L, "w")))
    val expected = Seq(("a", 1L, "x"), ("b", 2L, "y"), ("c", 3L, "z"))
      .toDF("k", "cnt", "tag")
    val diffs = Audit.viewDiff(t, expected, Seq("k")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(diffs.keySet == Set("a", "c", "d")) // b agrees → absent
    assert(diffs("a").getString(1) == "drift")
    assert(diffs("a").getSeq[String](2) == Seq("cnt")) // tag agrees, cnt differs
    assert(diffs("c").getString(1) == "missing")
    assert(diffs("d").getString(1) == "extra")
    val sum = Audit.viewAudit(t, expected, Seq("k")).collect()(0)
    assert(sum.getLong(sum.fieldIndex("n_missing")) == 1L)
    assert(sum.getLong(sum.fieldIndex("n_extra")) == 1L)
    assert(sum.getLong(sum.fieldIndex("n_drift")) == 1L)
    assert(sum.getInt(sum.fieldIndex("audit_ok")) == 0)
  }

  test("null payloads compare null-safe; one-sided columns are ignored") {
    val s = spark
    import s.implicits._
    val t = KeyedTable(spark, tmpDir("audit3"), Seq("k"))
    t.overwrite(Seq(("a", Option.empty[String]), ("b", Some("v")))
      .toDF("k", "tag").withColumn("view_only", lit(7)))
    // null == null must agree; expected-only columns must not drift
    val expected = Seq(("a", Option.empty[String]), ("b", Some("v")))
      .toDF("k", "tag").withColumn("exp_only", lit(9))
    assert(Audit.viewDiff(t, expected, Seq("k")).count() == 0)
    // null vs value IS drift
    val expected2 = Seq(("a", Some("now-set")), ("b", Some("v"))).toDF("k", "tag")
    val d = Audit.viewDiff(t, expected2, Seq("k")).collect()
    assert(d.length == 1 && d(0).getString(0) == "a" && d(0).getString(1) == "drift")
  }
}
