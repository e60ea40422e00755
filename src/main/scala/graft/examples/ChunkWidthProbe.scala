package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Band-bucket width histogram for the chunk near-dedup family (32×1
  * banding over distinct-collapsed 16/16 chunk reps) — the measurement
  * behind q_chunk_neardup_capped's default cap choice.
  */
object ChunkWidthProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- args) {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val reps = Dedup.chunkReps(docs, "doc_id", "text")
      val idx = Dedup.bandIndex(reps, "cid", "chunk_text",
        n = 3, numHashes = 32, bands = 32, rowsPerBand = 1)
      val wid = idx.groupBy("band_idx", "band_val").agg(count(lit(1)).as("width"))
      println(s"=== $sf reps=${reps.count()}")
      wid.groupBy("width").agg(count(lit(1)).as("n_buckets"))
        .orderBy(desc("width")).show(20, false)
      val mass = wid.select(sum(col("width") * (col("width") - 1) / 2))
        .collect()(0).get(0)
      println(s"pair mass sum C(w,2) = $mass")
    }
    spark.stop()
  }
}
// (probe extended r17: candidate-pair mass Σ C(w,2) per scale — the cost
// model of the uncapped miner's bucket self-join)
