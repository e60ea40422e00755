package graft.examples

import graft.operators.{Sketches, Similarity}
import graft.queries.Td
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures, on the REAL `embeddings`/`events` tables, the quantities the
  * oracle-gated derived checks in `q_ann_*`/`q_approx_distinct` assert:
  * per-query ANN recall@k vs the exact cosine top-k, and the HLL distinct
  * estimate's relative error per event_type. The bounds baked into those
  * queries must hold with comfortable margin at every SF the driver runs
  * (sf0.01 correctness, sf0.1 bench) — this prints the observed values so
  * the margins are measured, not guessed.
  *
  * Usage: runMain graft.examples.RecallProbe /root/testdata/sf0.01
  */
object RecallProbe {
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
      println(f"PROBE $name%-8s min=${rs.min}%.2f mean=${rs.sum / rs.length}%.2f " +
        s"perQuery=${hits.map { case (q, h) => s"$q:$h" }.mkString(",")}")
    }
    recalls("lsh", Similarity.lshTopK(emb, queries, "vec_id", "embedding",
      k = 5, dim = 64, bits = 6, tables = 8))
    recalls("ivf", Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 4))
    recalls("pq", Similarity.pqTopK(emb, queries, "vec_id", "embedding",
      dim = 64, topK = 5, m = 8, k = 16, iters = 2, rerank = 50))
    recalls("ivfpq", Similarity.ivfPqSearch(
      Similarity.ivfPqBuild(emb, "vec_id", "embedding", dim = 64,
        nlist = 16, m = 8, k = 16, iters = 2),
      emb, queries, "vec_id", "embedding", topK = 5, nprobe = 4, rerank = 50))

    // lshPairs recall vs the exact pair set at tau 0.45. This table's pairs
    // HUG the threshold (min sim 0.450 at every SF — measured via DuckDB),
    // LSH's worst regime: these numbers set q_embed_lsh_pairs' batch-level
    // recall bound, and explain why q_embed_dedup keeps the exact source.
    val exactPairs = Similarity.nearDupPairs(emb, "vec_id", "embedding", tau = 0.45)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((bits, tables) <- Seq((5, 12), (6, 12), (6, 16), (8, 16))) {
      val banded = Similarity.lshPairs(emb, "vec_id", "embedding", tau = 0.45,
          dim = 64, bits = bits, tables = tables)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"PROBE lshPairs b=$bits t=$tables " +
        f"recall=${(exactPairs & banded).size.toDouble / exactPairs.size}%.3f " +
        s"found=${banded.size} exact=${exactPairs.size}")
    }

    val ev = Td.events(spark, sfDir)
    val d = ev.groupBy("event_type").agg(
        countDistinct(col("user_id")).as("exact"),
        Sketches.approxDistinct(col("user_id")).as("approx"))
      .withColumn("rel_err", abs(col("approx") - col("exact")) / col("exact"))
      .orderBy("event_type")
      .collect()
    d.foreach(r => println(f"PROBE hll ${r.getString(0)}%-12s exact=${r.getLong(1)} " +
      f"approx=${r.getLong(2)} rel_err=${r.getDouble(3)}%.4f"))
    spark.stop()
  }
}
