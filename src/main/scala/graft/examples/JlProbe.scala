package graft.examples

import graft.operators.Similarity
import graft.queries.Td
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures jlTopK recall against the exact top-5 across (kProj,
  * candidates) combos — the evidence behind q_ann_jl_topk's gate
  * thresholds. Run per SF dir:
  *   sbt "runMain graft.examples.JlProbe /root/testdata/sf0.01"
  */
object JlProbe {
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
      .select("query_id", "neighbor_id").localCheckpoint()

    for (kProj <- Seq(8, 12, 16); cand <- Seq(64, 128, 200)) {
      val ann = Similarity.jlTopK(emb, queries, "vec_id", "embedding",
        k = 5, dim = 64, kProj = kProj, candidates = cand)
      val hits = ann.select("query_id", "neighbor_id")
        .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("h"))
      val rows = exact.select("query_id").distinct()
        .join(hits, Seq("query_id"), "left_outer")
        .withColumn("h", coalesce(col("h"), lit(0L)))
        .collect().map(_.getAs[Long]("h"))
      println(f"kProj=$kProj%2d cand=$cand%3d minHits=${rows.min} " +
        f"mean=${rows.sum.toDouble / (rows.length * 5)}%.2f")
    }
    spark.stop()
  }
}
