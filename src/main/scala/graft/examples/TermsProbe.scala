package graft.examples

import graft.operators.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forensics for topTerms: is the double-consumption of the tf relation
  * (window top-k branch + global-df branch) worth materializing away?
  * Variant A = current lazy plan (tf computed twice); variant B =
  * localCheckpoint(tf) then both branches read the materialized rows.
  */
object TermsProbe {
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
    for (i <- 1 to 3) {
      time(s"lazy#$i") { TextOps.topTerms(docs, "doc_id", "text", 3).count() }
      time(s"ckpt#$i") {
        val ex = docs.select(col("doc_id").as("id"), explode(TextOps.tokens(col("text"))).as("term"))
        val tf = ex.groupBy("id", "term").agg(count(lit(1)).as("tf")).localCheckpoint()
        val gdf = tf.groupBy("term").agg(count(lit(1)).as("global_df"))
        val w = Window.partitionBy("id").orderBy(col("tf").desc, col("term").asc)
        tf.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
          .join(gdf, "term").count()
      }
      time(s"wind#$i") {
        val ex = docs.select(col("doc_id").as("id"), explode(TextOps.tokens(col("text"))).as("term"))
        val tf = ex.groupBy("id", "term").agg(count(lit(1)).as("tf"))
        val wTerm = Window.partitionBy("term")
        val wId = Window.partitionBy("id").orderBy(col("tf").desc, col("term").asc)
        tf.withColumn("global_df", count(lit(1)).over(wTerm))
          .withColumn("rank", row_number().over(wId))
          .filter(col("rank") <= 3).count()
      }
    }
    spark.stop()
  }
}
