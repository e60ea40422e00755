package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Evidence probe for the Generate-inferred variant of the filter-pushdown
  * blowup law (SCALING.md r16; r17 instance): exploding an ALIASED heavy
  * array lets InferFiltersFromGenerate add size>0/isnotnull filters on the
  * attribute, which predicate pushdown then substitutes the alias tree
  * into — the heavy kernel runs 3× per input row (twice in the Filter,
  * once in the Project). Putting the expression directly inside the
  * Generate skips the infer rule (it only fires on attribute children) and
  * GenerateExec evaluates its generator once per input row.
  *
  * Prints both executed plans; [[graft.operators.Dedup.substringSpans]]
  * ships the inline shape.
  */
object GenerateInferProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = df.select(col("doc_id"),
        graft.functions.Kernels.window_fps(TextOps.tokens(col("text")), 16).as("__f"))
      .select(col("doc_id"), posexplode(col("__f")).as(Seq("p", "w")))
    println("=== aliased-attribute shape (kernel runs 3x per row)")
    println(a.queryExecution.executedPlan)
    val b = df.select(col("doc_id"),
        posexplode(graft.functions.Kernels.window_fps(TextOps.tokens(col("text")), 16))
          .as(Seq("p", "w")))
    println("=== inline-generator shape (kernel runs once per row)")
    println(b.queryExecution.executedPlan)
    spark.stop()
  }
}
