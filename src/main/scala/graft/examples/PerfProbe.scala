package graft.examples
import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$d/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $name%-28s rows=$n%9d  ${(System.nanoTime()-t0)/1e9}%8.2f s")
    }
    time("explodedShingles")(Dedup.explodedShingles(docs, "doc_id", "text", 3).count())
    time("jaccardPairs")(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5).count())
    time("minhash bands")(Dedup.withBands(Dedup.withMinHashes(
      docs.select("doc_id","text"), "doc_id", "text", 3, 32), 8, 4).count())
    time("lshCandidates")(Dedup.lshCandidates(docs, "doc_id", "text").count())
    time("minhashDedup")(Dedup.minhashDedup(docs, "doc_id", "text", tau = 0.5).count())
    spark.stop()
  }
}
