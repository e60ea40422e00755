package graft.examples

import graft.operators.{QualityOps, Sampling, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level wall decomposition of q_pipeline_e2e — where does the
  * composed plan spend its time relative to the ~4 s its stages cost alone
  * (r16: the unpinned composition read 74.9 s at sf1; pinned, 24.9 s —
  * this probe attributes the remainder).
  *
  *   runMain graft.examples.PipelineProbe /tmp/graft-sf1
  */
object PipelineProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PIPE $label%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import org.apache.spark.sql.expressions.Window
    val docs = graft.queries.Td.documents(spark, dir)
    val w = Window.partitionBy("__fp").orderBy("doc_id")
    val dd = docs.select(col("doc_id"), col("lang"), col("text"),
        TextOps.polyHash(TextOps.normText(col("text"))).as("__fp"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__fp", "__rn")
    val ddP = timed("dedup-pin")(dd.localCheckpoint())
    val gate = QualityOps.gopherGate(ddP, "doc_id", "text")
      .filter(col("pass") === 1).select("doc_id", "n_words")
    val keptPlan = gate.join(ddP.select("doc_id", "lang"), "doc_id")
    val kept = timed("gopher-pin")(keptPlan.localCheckpoint())
    val mixed = timed("mix-pin")(
      Sampling.temperatureMix(kept, "lang", "doc_id").localCheckpoint())
    val sharded = TextOps.shardAssignCounts(
        mixed.select(col("doc_id").as("id"), col("n_words").as("n_tokens")),
        shardTokens = 2000L, bucketSpan = 64L)
      .join(mixed.select(col("doc_id").as("id"), col("lang")), "id")
    timed("shard+join")(sharded.count())
    // the shipped shape for comparison: dd UNPINNED inside kept
    val gate2 = QualityOps.gopherGate(dd, "doc_id", "text")
      .filter(col("pass") === 1).select("doc_id", "n_words")
    val kept2 = timed("gopher-nopin-dd")(
      gate2.join(dd.select("doc_id", "lang"), "doc_id").localCheckpoint())
    println(s"PIPE rows kept=${kept.count()} mixed=${mixed.count()}")
    spark.stop()
  }
}
