package graft.examples

import graft.operators.{QualityOps, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bisect PipelineProbe's 29 s gopher stage: is it the gopher expressions,
  * the localCheckpoint child, the window child, or the survivor join?
  *
  *   runMain graft.examples.PipelineProbe2 /tmp/graft-sf1
  */
object PipelineProbe2 {
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
      println(f"PIPE2 $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import org.apache.spark.sql.expressions.Window
    val docs = graft.queries.Td.documents(spark, dir)
    timed("gopher-on-parquet")(
      QualityOps.gopherGate(docs, "doc_id", "text").count())
    val slim = docs.select(col("doc_id"), col("lang"), col("text"))
    timed("gopher-on-project")(
      QualityOps.gopherGate(slim, "doc_id", "text").count())
    val pinned = timed("pin-slim")(slim.localCheckpoint())
    timed("gopher-on-pinned")(
      QualityOps.gopherGate(pinned, "doc_id", "text").count())
    timed("gopher-on-pinned-2nd")(
      QualityOps.gopherGate(pinned, "doc_id", "text").count())
    val w = Window.partitionBy("__fp").orderBy("doc_id")
    val dd = slim
      .withColumn("__fp", TextOps.polyHash(TextOps.normText(col("text"))))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__fp", "__rn")
    timed("gopher-on-window")(
      QualityOps.gopherGate(dd, "doc_id", "text").count())
    val ddP = timed("pin-window")(dd.localCheckpoint())
    timed("gopher-on-ddP")(
      QualityOps.gopherGate(ddP, "doc_id", "text").count())
    val gate = QualityOps.gopherGate(ddP, "doc_id", "text")
      .filter(col("pass") === 1).select("doc_id", "n_words")
    timed("gate-count")(gate.count())
    timed("gate-join-lang")(
      gate.join(ddP.select("doc_id", "lang"), "doc_id").count())
    timed("kept-pin")(
      gate.join(ddP.select("doc_id", "lang"), "doc_id").localCheckpoint())
    spark.stop()
  }
}
