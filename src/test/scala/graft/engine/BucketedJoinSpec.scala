package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located joins via Spark bucketing: two tables bucketed+sorted on the
  * join key join WITHOUT any Exchange — the shuffle happened once at write
  * time and is amortized over every subsequent join/aggregation. This is the
  * 100 TB recipe for the fact⋈fact joins no broadcast can cover (the
  * KeyedTable manifest buckets serve the same role for merge locality).
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join and aggregate with zero exchanges") {
    val s = spark
    import s.implicits._
    val wh = tmpDir("bjw")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1) // force non-broadcast
    try {
      spark.sql("DROP TABLE IF EXISTS bj_orders")
      spark.sql("DROP TABLE IF EXISTS bj_lines")
      (1L to 2000L).map(k => (k, s"o$k")).toDF("key", "o_payload")
        .write.option("path", s"$wh/bj_orders")
        .bucketBy(8, "key").sortBy("key").mode("overwrite").saveAsTable("bj_orders")
      (1L to 6000L).map(i => (i % 2000 + 1, i)).toDF("key", "line_id")
        .write.option("path", s"$wh/bj_lines")
        .bucketBy(8, "key").sortBy("key").mode("overwrite").saveAsTable("bj_lines")

      val joined = spark.table("bj_orders").join(spark.table("bj_lines"), "key")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected exchange-free co-located join:\n$plan")
      assert(joined.count() == 6000)

      // aggregation on the bucket key also reuses the layout: no exchange
      val agg = spark.table("bj_lines").groupBy("key").agg(count(lit(1)).as("n"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"), s"expected exchange-free agg:\n$aggPlan")
      assert(agg.count() == 2000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bj_orders")
      spark.sql("DROP TABLE IF EXISTS bj_lines")
    }
  }
}
