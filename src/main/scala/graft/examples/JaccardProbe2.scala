package graft.examples
import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** A/B: persist vs recompute for the shingle relation (dev probe). */
object JaccardProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $name%-32s rows=$n%9d  ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    time("warmup")(spark.range(100).count())
    for (i <- 1 to 2) {
      time(s"jaccard persist=true  #$i")(
        Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5, persistIntermediate = true).count())
      time(s"jaccard persist=false #$i")(
        Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5, persistIntermediate = false).count())
      time(s"minhashDedup persist=true  #$i")(
        Dedup.minhashDedup(docs, "doc_id", "text", tau = 0.5, persistIntermediate = true).count())
      time(s"minhashDedup persist=false #$i")(
        Dedup.minhashDedup(docs, "doc_id", "text", tau = 0.5, persistIntermediate = false).count())
    }
    spark.stop()
  }
}
