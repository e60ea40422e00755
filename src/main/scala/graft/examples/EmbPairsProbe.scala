package graft.examples
import graft.operators.Similarity
import graft.queries.Td
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r18 decomposition of q_embed_lsh_pairs (the #2 sf1 mover): times the
  * exact BNL arm, the banded miner's stages (sign buckets, candidate
  * self-join, distinct, verify), and the composed query, so optimization
  * targets the measured wall.
  */
object EmbPairsProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/sf1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $name%-28s rows=$n%10d  ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val emb = Td.embeddings(spark, d)
    time("exact nearDupPairs")(
      Similarity.nearDupPairs(emb, "vec_id", "embedding", tau = 0.45).count())
    time("lshPairs full")(
      Similarity.lshPairs(emb, "vec_id", "embedding", tau = 0.45,
        dim = 64, bits = 5, tables = 12).count())
    // stage decomposition of the banded arm
    val buckets = Similarity.signBucketIndex(emb, "vec_id", "embedding",
      dim = 64, bits = 5, tables = 12)
    time("signBuckets")(buckets.count())
    val cands0 = buckets.as("a").join(buckets.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    time("cand join (pre-distinct)")(cands0.count())
    time("cand distinct")(cands0.distinct().count())
    spark.stop()
  }
}
