package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class AggDeltaSpec extends SparkSpec {

  private def state(t: KeyedTable): Map[String, (Long, BigDecimal)] =
    t.current.collect().map(r => r.getString(0) ->
      (r.getLong(1), BigDecimal(r.getDecimal(2)))).toMap

  private def recompute(facts: DataFrame): Map[String, (Long, BigDecimal)] =
    facts.groupBy("g").agg(count(lit(1)).as("cnt"),
        coalesce(sum(col("v").cast("decimal(18,2)")), lit(0))
          .cast("decimal(28,2)").as("sum_v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), BigDecimal(r.getDecimal(2)))).toMap

  test("maintain ≡ recompute across inserts, in-place updates, group moves, deletes") {
    val s = spark
    import s.implicits._
    val t = KeyedTable(spark, tmpDir("ad1"), Seq("g"), numBuckets = 4)
    val base = Seq(("a", 1, 10.0), ("a", 2, 20.0), ("b", 3, 30.0), ("c", 4, 5.0))
      .toDF("g", "id", "v")
    AggDelta.bootstrap(t, base.select("g", "v"), Seq("g"), Seq("v"))
    assert(state(t) == recompute(base.select("g", "v")))

    // id1: update in place (a, 10→15); id3: MOVE b→a with value change;
    // id4: delete (c dies entirely); id5: fresh insert into new group d
    val cdc = Seq(
      ("a", 15.0, "a", 10.0, "U"),
      ("a", 31.0, "b", 30.0, "U"),
      (null.asInstanceOf[String], 0.0, "c", 5.0, "D"),
      ("d", 7.5, null.asInstanceOf[String], 0.0, "I"),
    ).toDF("g", "v", "_old_g", "_old_v", "_op")
      // null old images for I / new images for D, as a connector emits them
      .withColumn("_old_v", when(col("_op") === "I", lit(null)).otherwise(col("_old_v")))
      .withColumn("v", when(col("_op") === "D", lit(null)).otherwise(col("v")))
    AggDelta.maintain(t, cdc, Seq("g"), Seq("v"), oldPrefix = "_old_")

    val finalFacts = Seq(("a", 15.0), ("a", 20.0), ("a", 31.0), ("d", 7.5)).toDF("g", "v")
    assert(state(t) == recompute(finalFacts))
    assert(!state(t).contains("c"), "group retracted to zero must leave the table")
  }

  test("batchId guards consecutive redelivery; a fresh id applies") {
    val s = spark
    import s.implicits._
    val t = KeyedTable(spark, tmpDir("ad2"), Seq("g"))
    AggDelta.bootstrap(t, Seq(("a", 10.0)).toDF("g", "v"), Seq("g"), Seq("v"))
    val cdc = Seq(("a", 1.0, null.asInstanceOf[String],
      null.asInstanceOf[java.lang.Double], "I")).toDF("g", "v", "_old_g", "_old_v", "_op")

    val v1 = AggDelta.maintain(t, cdc, Seq("g"), Seq("v"), batchId = Some("b1"))
    assert(state(t)("a") == ((2L, BigDecimal("11.00"))))
    // redelivery of the SAME batch id: no-op, version unchanged
    assert(AggDelta.maintain(t, cdc, Seq("g"), Seq("v"), batchId = Some("b1")) == v1)
    assert(state(t)("a") == ((2L, BigDecimal("11.00"))))
    // a new id applies (increments are NOT idempotent — the tag is the guard)
    AggDelta.maintain(t, cdc, Seq("g"), Seq("v"), batchId = Some("b2"))
    assert(state(t)("a") == ((3L, BigDecimal("12.00"))))
  }

  test("retraction below zero fails in-plan; unknown op fails; needs bootstrap") {
    val s = spark
    import s.implicits._
    val t = KeyedTable(spark, tmpDir("ad3"), Seq("g"))
    val cdc = Seq(("a", 1.0, "a", 1.0, "U")).toDF("g", "v", "_old_g", "_old_v", "_op")
    intercept[IllegalArgumentException] {
      AggDelta.maintain(t, cdc, Seq("g"), Seq("v"))
    }
    AggDelta.bootstrap(t, Seq(("a", 10.0)).toDF("g", "v"), Seq("g"), Seq("v"))
    // two deletes against a one-row group: count would go negative
    val over = Seq(("x", 0.0, "a", 10.0, "D"), ("x", 0.0, "a", 10.0, "D"))
      .toDF("g", "v", "_old_g", "_old_v", "_op")
    val e1 = intercept[Exception] { AggDelta.maintain(t, over, Seq("g"), Seq("v")) }
    val chain = Iterator.iterate[Throwable](e1)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("retracted below zero"), chain)
    val bad = Seq(("a", 1.0, "a", 1.0, "X")).toDF("g", "v", "_old_g", "_old_v", "_op")
    intercept[Exception] { AggDelta.maintain(t, bad, Seq("g"), Seq("v")) }
    // failed applies must not have changed the state
    assert(state(t)("a") == ((1L, BigDecimal("10.00"))))
  }

  test("bucketed state: delta touching one group rewrites only its bucket") {
    val s = spark
    import s.implicits._
    val t = KeyedTable(spark, tmpDir("ad4"), Seq("g"), numBuckets = 8)
    val base = (1 to 80).map(i => (s"g${i % 8}", i.toDouble)).toDF("g", "v")
    AggDelta.bootstrap(t, base, Seq("g"), Seq("v"))
    val m1 = t.manifest
    val cdc = Seq(("g3", 100.0, null.asInstanceOf[String],
      null.asInstanceOf[java.lang.Double], "I")).toDF("g", "v", "_old_g", "_old_v", "_op")
    AggDelta.maintain(t, cdc, Seq("g"), Seq("v"))
    val m2 = t.manifest
    assert(m2.values.count(_ == 2L) == 1, s"expected one touched bucket, got $m2")
    assert(m2.values.count(_ == 1L) == m1.size - 1)
    assert(state(t) == recompute(base.union(Seq(("g3", 100.0)).toDF("g", "v"))))
  }
}
