package graft.examples

import graft.operators.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Forensics for ngramCounts' sf0.1 cost (~27 s, reproducible on a quiet
  * box): which stage pays — the tokenize+HOF gram build, the explode, the
  * (gram, id) aggregate, or the final gram aggregate?
  */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $tag rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (i <- 1 to 2) {
      time(s"tokens-size#$i") {
        docs.select(sum(size(TextOps.tokens(col("text"))))).head().getLong(0)
      }
      // inline form: the lambda's element_at re-runs tokenize per element
      time(s"grams-inline#$i") {
        docs.select(sum(size(TextOps.ngramsRaw(TextOps.tokens(col("text")), 3)))).head().getLong(0)
      }
      // aliased form: element_at reads a bound attribute
      time(s"grams-aliased#$i") {
        docs.select(TextOps.tokens(col("text")).as("__toks"))
          .select(sum(size(TextOps.ngramsRaw(col("__toks"), 3)))).head().getLong(0)
      }
      val ex = docs.select(col("doc_id").as("id"), TextOps.tokens(col("text")).as("__toks"))
        .select(col("id"), explode(TextOps.ngramsRaw(col("__toks"), 3)).as("ngram"))
      time(s"explode#$i") { ex.count() }
      time(s"agg1#$i") { ex.groupBy("ngram", "id").agg(count(lit(1))).count() }
      time(s"full#$i") {
        TextOps.ngramCounts(docs, "doc_id", "text", 3, 2L).count()
      }
    }
    spark.stop()
  }
}
