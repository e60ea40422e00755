package graft.examples

import graft.operators.Similarity
import graft.queries.Td
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures per-query recall@5 of the INCREMENTALLY-GROWN stored indexes
  * (base trained on the hash-bucket < 60 slice, 40% appended through the
  * no-retrain path — Td.ivfIncIndexTable / ivfpqIncIndexTable) against the
  * exact cosine top-k, plus the growth state the q_ann_*_inc queries pin.
  * The recall bounds baked into those queries come from these observations
  * (≤ half the worst value across sf0.01/sf0.1), same discipline as
  * RecallProbe for the rebuild-only indexes.
  *
  * Usage: runMain graft.examples.IncAnnProbe /root/testdata/sf0.01
  */
object IncAnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Td.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id")
    def recalls(name: String, ann: org.apache.spark.sql.DataFrame): Unit = {
      val perQ = ann.select("query_id", "neighbor_id")
        .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("hits"))
      val hits = exact.select("query_id").distinct()
        .join(perQ, Seq("query_id"), "left_outer")
        .select(col("query_id"), coalesce(col("hits"), lit(0L)).as("hits"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
      val rs = hits.map(_._2 / 5.0)
      println(f"PROBE $name%-10s min=${rs.min}%.2f mean=${rs.sum / rs.length}%.2f " +
        s"perQuery=${hits.map { case (q, h) => s"$q:$h" }.mkString(",")}")
    }

    val (ivfIdx, ivfGrowth, ivfBatches) = Td.ivfIncIndexTable(spark, sfDir)
    println(s"GROWTH ivfinc   base=${ivfGrowth.baseRows} appended=${ivfGrowth.appendedRows} " +
      f"frac=${ivfGrowth.appendFraction}%.3f batches=$ivfBatches")
    recalls("ivfinc", Similarity.ivfSearch(ivfIdx, queries, "vec_id", "embedding",
      k = 5, nprobe = 4))

    val (pqIdx, pqGrowth, pqBatches) = Td.ivfpqIncIndexTable(spark, sfDir)
    println(s"GROWTH ivfpqinc base=${pqGrowth.baseRows} appended=${pqGrowth.appendedRows} " +
      f"frac=${pqGrowth.appendFraction}%.3f batches=$pqBatches")
    recalls("ivfpqinc", Similarity.ivfPqSearch(pqIdx, emb, queries, "vec_id", "embedding",
      topK = 5, nprobe = 4, rerank = 50))

    spark.stop()
  }
}
