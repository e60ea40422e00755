package graft.examples
import graft.operators.{Dedup, Sampling}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** A/B probe: incremental dedup with per-side shingling (old) vs one shared
  * tokenization pass filtered by the split predicate (new). Reports warm
  * second-run times — cold runs carry JIT/codegen noise bigger than the
  * difference under ambient load.
  */
object IncProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val bkt = Sampling.hashBucket(col("doc_id"))
    val corpus = docs.filter(bkt < 80)
    val batch = docs.filter(bkt >= 80)
    def old(): Long = {
      val idx = Dedup.bandIndex(corpus, "doc_id", "text")
      Dedup.dedupAgainstIndex(batch, "doc_id", "text", corpus, idx).count()
    }
    def shared(): Long = {
      val ex = Dedup.explodedShingles(docs, "doc_id", "text", 3)
      val exBkt = Sampling.hashBucket(col("id"))
      val idx = Dedup.bandIndex(corpus, "doc_id", "text", shingles = Some(ex.filter(exBkt < 80)))
      Dedup.dedupAgainstIndex(batch, "doc_id", "text", corpus, idx,
        shingles = Some(ex.filter(exBkt >= 80))).count()
    }
    for (r <- 1 to 2; (name, f) <- Seq("old" -> old _, "shared" -> shared _)) {
      val t0 = System.nanoTime(); val n = f()
      println(f"PROBE run$r $name%-8s rows=$n%6d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
