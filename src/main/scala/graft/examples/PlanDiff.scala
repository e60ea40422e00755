package graft.examples
import graft.SparkEntry
import org.apache.spark.sql.SparkSession
object PlanDiff {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    for (q <- args.drop(1)) {
      println(s"===== $q")
      println(SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString.take(16000))
    }
    spark.stop()
  }
}
