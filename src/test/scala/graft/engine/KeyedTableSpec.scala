package graft.engine

import graft.SparkSpec

class KeyedTableSpec extends SparkSpec {

  test("merge inserts new keys, updates existing, never deletes; idempotent") {
    val s = spark
    import s.implicits._
    val root = tmpDir("kt")
    val t = KeyedTable(spark, root, Seq("id"), orderCol = Some("ver"))

    t.merge(Seq(("a", 1, "A1"), ("b", 1, "B1")).toDF("id", "ver", "payload"))
    assert(t.currentVersion == 1)
    assert(t.current.count() == 2)

    // batch with one update (newer), one insert, and two versions of one key
    val batch = Seq(("b", 2, "B2"), ("c", 1, "C1"), ("c", 2, "C2")).toDF("id", "ver", "payload")
    t.merge(batch)
    val m = t.current.collect().map(r => r.getString(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(m == Map("a" -> (1, "A1"), "b" -> (2, "B2"), "c" -> (2, "C2")))

    // idempotence: re-applying the same batch changes nothing but the version
    t.merge(batch)
    val m2 = t.current.collect().map(r => r.getString(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(m2 == m)
    assert(t.currentVersion == 3)
  }

  test("last-arriving version wins even if older (faithful T3 semantics, SURVEY §7.5)") {
    val s = spark
    import s.implicits._
    val t = KeyedTable(spark, tmpDir("kt2"), Seq("id"), orderCol = Some("ver"))
    t.merge(Seq(("a", 5, "newest")).toDF("id", "ver", "payload"))
    t.merge(Seq(("a", 3, "older-but-later")).toDF("id", "ver", "payload"))
    val r = t.current.collect()(0)
    assert(r.getString(2) == "older-but-later") // no updated_at freshness gate
  }

  test("overwrite is truncate-and-reload; bucketed table prunes and round-trips") {
    val s = spark
    import s.implicits._
    val t = KeyedTable(spark, tmpDir("kt3"), Seq("id"), orderCol = Some("ver"), numBuckets = 4)
    t.merge((1 to 100).map(i => (s"k$i", 1, i)).toDF("id", "ver", "v"))
    assert(t.current.count() == 100)
    assert(t.current.columns.toSeq == Seq("id", "ver", "v")) // bucket col hidden
    t.overwrite(Seq(("x", 1, 0)).toDF("id", "ver", "v"))
    assert(t.current.count() == 1)
  }
}
