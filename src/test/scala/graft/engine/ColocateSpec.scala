package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ColocateSpec extends SparkSpec {

  test("bucketed join runs with zero shuffle exchanges; plain join does not") {
    val s = spark
    import s.implicits._
    val base = System.getProperty("java.io.tmpdir")
    val facts = (1 to 2000).map(i => (i.toLong, s"u${i % 50}", i * 1.5)).toDF("id", "user", "v")
    val dims = (1 to 2000).map(i => (i.toLong, s"t${i % 7}")).toDF("id", "typ")
    Colocate.materialize(facts, "cb_spec_facts", Seq("id"), 8, Some(s"$base/cb_spec_facts"))
    Colocate.materialize(dims, "cb_spec_dims", Seq("id"), 8, Some(s"$base/cb_spec_dims"))

    val j = Colocate.bucketedJoin(spark, "cb_spec_facts", "cb_spec_dims", Seq("id"))
    assert(Colocate.exchangeCount(j) == 0, "co-located join must not shuffle either side")
    // one file per bucket — the repartition-before-bucketBy contract that
    // keeps scans tight and sortBy's sorted-scan property alive
    val files = new java.io.File(s"$base/cb_spec_facts").listFiles()
      .filter(f => f.getName.startsWith("part-"))
    assert(files.length == 8, s"expected 1 file x 8 buckets, got ${files.length}")

    // the same join over the raw frames DOES exchange — the feature is real
    val plain = facts.hint("merge").join(dims, Seq("id"))
    assert(Colocate.exchangeCount(plain) > 0, "plain merge join should shuffle")

    // and co-location never changes the values
    val got = j.select("id", "user", "v", "typ").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).sortBy(_._1)
    val want = plain.select("id", "user", "v", "typ").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).sortBy(_._1)
    assert(got.sameElements(want))

    // a groupBy ON the bucket key also rides the reported partitioning —
    // aggregation without an exchange is the same economics for rollups
    val agg = Colocate.bucketedAggregate(spark, "cb_spec_facts", Seq("id"),
      Seq(sum("v").as("sv")))
    assert(Colocate.exchangeCount(agg) == 0, "bucket-key aggregation must not shuffle")
    // ...and equals the plain aggregation
    val aggPlain = facts.groupBy("id").agg(sum("v").as("sv")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(agg.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap == aggPlain)

    spark.sql("DROP TABLE IF EXISTS cb_spec_facts")
    spark.sql("DROP TABLE IF EXISTS cb_spec_dims")
  }

  test("KeyedTable.materializeBucketed exports manifest state for co-located joins") {
    val s = spark
    import s.implicits._
    val base = System.getProperty("java.io.tmpdir")
    val t = KeyedTable(spark, tmpDir("cbkt"), Seq("id"), orderCol = Some("ver"), numBuckets = 8)
    t.merge((1 to 300).map(i => (i.toLong, 1, s"p$i")).toDF("id", "ver", "p"))
    t.merge(Seq((5L, 2, "updated")).toDF("id", "ver", "p"))
    t.materializeBucketed("cb_spec_kt", Some(s"$base/cb_spec_kt"))
    val back = spark.table("cb_spec_kt")
    assert(back.count() == 300)
    assert(back.filter($"id" === 5L).select("p").as[String].collect().toSeq == Seq("updated"))
    val selfJoin = spark.table("cb_spec_kt").hint("merge")
      .join(spark.table("cb_spec_kt").select($"id", $"p".as("p2")), Seq("id"))
    assert(Colocate.exchangeCount(selfJoin) == 0)
    spark.sql("DROP TABLE IF EXISTS cb_spec_kt")
  }
}
