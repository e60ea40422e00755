package graft.examples
import graft.SparkEntry
import org.apache.spark.sql.SparkSession
/** Does Spark 4's InferWindowGroupLimit kick in for our rank-filter top-k? */
object WglProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (q <- Seq("q_cosine_topk", "q_latest_per_key", "q_topk_orders", "q_ann_lsh_topk")) {
      val plan = SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
      val wgl = plan.linesIterator.filter(l => l.contains("WindowGroupLimit") || l.contains("TakeOrdered")).map(_.trim.take(100)).toSeq
      println(s"WGL $q -> ${if (wgl.isEmpty) "NONE" else wgl.mkString(" | ")}")
    }
    spark.stop()
  }
}
