package graft.examples
import graft.operators.Similarity.{trainCentroids, ivfBuild}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch instrument for the r12 SemKnobProbe anomaly: cell-occupancy
  * balance at over-parameterized nlist (see SCALING.md semantic_dedup row).
  */
object CellHist {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = spark.read.parquet(args.headOption.getOrElse("/tmp/graft-semknob-100x"))
    for (k <- Seq(16, 64, 256, 1024)) {
      val idx = ivfBuild(corpus, "vec_id", "embedding", nlist = k, iters = 3)
      val hist = idx.assigned.groupBy("cell").count()
        .agg(count(lit(1)).as("ncells"), max("count").as("maxcell"),
          expr("percentile(count, 0.5)").as("median"),
          sum(expr("count*(count-1)/2")).as("pairs")).head()
      println(s"HIST nlist=$k nonEmptyCells=${hist.get(0)} maxCell=${hist.get(1)} medianCell=${hist.get(2)} inCellPairs=${hist.get(3)}")
    }
    spark.stop()
  }
}
