package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins and aggregations.
  *
  * AQE's skew-join rewrite (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) handles sort-merge-join skew at runtime by splitting oversized
  * partitions — prefer it when applicable. These operators cover the cases
  * AQE doesn't: hash aggregations over a hot key, and broadcast-infeasible
  * joins where one specific key dominates.
  */
object SkewOps {

  /** Two-phase aggregation for a skewed group-by: salt the key into
    * `saltBuckets` sub-keys (spreading one hot key over many reducers),
    * partially aggregate, then aggregate the partials. Caller supplies the
    * partial and final aggregate pairs — they must be reassociable (sum/sum,
    * count/sum, min/min, max/max).
    *
    * {{{
    * SkewOps.saltedAggregate(df, Seq("country"), 16,
    *   partial = Seq(count(lit(1)).as("n"), sum($"v").as("s")),
    *   fin     = Seq(sum($"n").as("n"), sum($"s").as("s")))
    * }}}
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                      partial: Seq[Column], fin: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val phase1 = salted.groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    phase1.groupBy(keys.map(col): _*).agg(fin.head, fin.tail: _*)
  }

  /** Skew-safe equi-join of a big skewed left side against a non-broadcastable
    * right side: replicate each right row `saltBuckets` times (tagged 0..R-1),
    * salt left rows randomly into the same range, and join on (key, salt) —
    * the hot key's rows spread across `saltBuckets` reducers instead of one.
    * Output equals the plain inner join.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltBuckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1)).cast("array<long>")))
    saltedLeft.join(replicatedRight, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
