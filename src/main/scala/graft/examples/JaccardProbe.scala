package graft.examples
import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Warm per-stage timing of the jaccard/minhash path (dev probe). */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$d/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $name%-28s rows=$n%9d  ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    time("warm docs.count")(docs.count())
    println("PROBE docs partitions = " + docs.rdd.getNumPartitions)
    time("shingles cold")(Dedup.explodedShingles(docs, "doc_id", "text", 3).count())
    time("shingles warm")(Dedup.explodedShingles(docs, "doc_id", "text", 3).count())
    val ex = Dedup.explodedShingles(docs, "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("persist materialize")(ex.count())
    time("sizes agg")(ex.groupBy("id").agg(count(lit(1))).count())
    time("self-join+agg")(
      ex.as("a").join(ex.as("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id"))
        .groupBy(col("a.id"), col("b.id")).agg(count(lit(1))).count())
    time("self-join row fanout")(
      ex.as("a").join(ex.as("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id")).count())
    time("jaccardPairs warm")(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5).count())
    time("minhash sigs")(Dedup.withMinHashes(
      docs.select("doc_id", "text"), "doc_id", "text", 3, 32).count())
    time("lsh cands warm")(Dedup.lshCandidates(docs, "doc_id", "text").count())
    time("minhashDedup warm")(Dedup.minhashDedup(docs, "doc_id", "text", tau = 0.5).count())
    spark.stop()
  }
}
