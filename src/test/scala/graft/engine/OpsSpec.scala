package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def bookings() = {
    val s = spark
    import s.implicits._
    Seq(
      // (booking_id, checkin, checkout, updated_at)
      ("b1", "2025-08-11", "2025-08-14", "2025-07-14T09:30:01+00:00"),
      ("b2", "2025-08-14", "2025-08-11", "2025-07-14T09:30:02+00:00"), // bad: checkout < checkin
      ("b3", null, "2025-08-14", "2025-07-14T09:30:03+00:00"),        // null predicate → accepted
      ("b4", "2025-08-11", null, "2025-07-14T09:30:04+00:00"),        // null predicate → accepted
    ).toDF("booking_id", "checkin_date", "checkout_date", "updated_at")
      .withColumn("checkin_date", to_date($"checkin_date"))
      .withColumn("checkout_date", to_date($"checkout_date"))
  }

  test("T1 split is disjoint and routes null predicates to the accepted branch") {
    val df = bookings()
    val (bad, ok) = Ops.split(df, col("checkout_date") < col("checkin_date"))
    assert(bad.select("booking_id").collect().map(_.getString(0)).toSet == Set("b2"))
    assert(ok.select("booking_id").collect().map(_.getString(0)).toSet == Set("b1", "b3", "b4"))
    assert(bad.count() + ok.count() == df.count())
  }

  test("latestPerKey keeps exactly the newest row per key, nulls last, tie-broken") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("k1", 1, "old"), ("k1", 3, "new"), ("k1", 2, "mid"),
      ("k2", 5, "only"),
      ("k3", 7, "a"), ("k3", 7, "b"), // tie on order col → tie-break col decides
    ).toDF("k", "v", "tag")
    val latest = Ops.latestPerKey(df, Seq("k"), "v", tieBreak = Seq("tag"))
      .collect().map(r => (r.getString(0), r.getString(2))).toMap
    assert(latest == Map("k1" -> "new", "k2" -> "only", "k3" -> "b"))

    val withNull = Seq(("k1", Some(1), "real"), ("k1", None, "nullver")).toDF("k", "v", "tag")
    val l2 = Ops.latestPerKey(withNull, Seq("k"), "v").collect()
    assert(l2.length == 1 && l2(0).getString(2) == "real") // nulls last
  }

  test("T2+T3 lookup-latest + flag: unmatched → insert, matched → update (no freshness gate)") {
    val s = spark
    import s.implicits._
    val incoming = Seq(("b1", 10), ("b9", 11)).toDF("booking_id", "v")
    val existing = Seq(
      ("b1", "2025-01-01T00:00:00+00:00"),
      ("b1", "2025-06-01T00:00:00+00:00"), // two versions: lookup must see only latest
    ).toDF("booking_id", "updated_at").withColumn("updated_at", to_timestamp($"updated_at"))
    val looked = Ops.lookupLatest(incoming, existing, "booking_id", "updated_at")
    val flagged = Ops.flagInsertUpdate(looked, "lookup_booking_id")
    val ops = flagged.select("booking_id", Ops.OpCol)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(ops == Map("b1" -> "update", "b9" -> "insert"))
    // row count unchanged: right side deduped to one row per key
    assert(flagged.count() == 2)
  }

  test("Align casts strings to declared types and fills missing columns with nulls") {
    val s = spark
    import s.implicits._
    val raw = Seq(
      ("b1", "42", "2025-08-11", "2025-07-14T09:30:01.123456+00:00", 666.5),
    ).toDF("booking_id", "customer_id", "checkin_date", "updated_at", "total_amount")
    val aligned = Align.alignTo(raw, Schemas.bookingFact)
    assert(aligned.schema == Schemas.bookingFact.copy(fields =
      Schemas.bookingFact.fields.map(_.copy(nullable = true))) ||
      aligned.columns.toSeq == Schemas.bookingFact.fieldNames.toSeq)
    val r: Row = aligned.collect()(0)
    assert(r.getAs[Int]("customer_id") == 42)
    assert(r.getAs[java.sql.Date]("checkin_date").toString == "2025-08-11")
    assert(r.getAs[java.math.BigDecimal]("total_amount").toString == "666.50")
    assert(r.isNullAt(aligned.columns.indexOf("city"))) // missing → typed null
  }
}
