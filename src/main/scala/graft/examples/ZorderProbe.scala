package graft.examples

import org.apache.spark.sql.SparkSession

/** Measures the 2-D zone-map pruning of `Td.zorderEventsTable` — how many
  * of the 32 buckets a ts window, a user_id window, and their rectangle
  * intersection actually admit, per SF. The q_zorder_prune flag thresholds
  * are set from THESE numbers (≤ half at 2× margin where the curve
  * delivers it), not guessed.
  *
  *   sbt "runMain graft.examples.ZorderProbe /root/testdata/sf0.01"
  */
object ZorderProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = graft.queries.Td.zorderEventsTable(spark, sf)
    val n = t.manifest.size
    val tsLo = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val tsHi = java.sql.Timestamp.valueOf("2024-01-12 23:59:59.999999")
    val kTs = t.rangeScanBuckets("ts", tsLo, tsHi).get
    val kU = t.rangeScanBuckets("user_id", 40L, 55L).get
    val both = kTs.toSet & kU.toSet
    println(s"ZPROBE sf=$sf buckets=$n ts3d=${kTs.size} user16=${kU.size} rect=${both.size}")
    spark.stop()
  }
}
