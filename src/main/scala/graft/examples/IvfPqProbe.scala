package graft.examples

import graft.operators.Similarity
import graft.queries.Td
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence probe for the IVF+PQ composition's scale claim: the search's
  * ADC stage must read ONLY the probed cells' code files. Prints the
  * partition-filter lines of the stored-codes scan (expect a dynamicpruning
  * expression on `cell`) and the scanned-partition count from the executed
  * plan's file-source metrics, per query batch.
  *
  * Usage: runMain graft.examples.IvfPqProbe /root/testdata/sf0.01
  */
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val index = Td.ivfpqIndexTable(spark, sfDir)
    val emb = Td.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    val out = Similarity.ivfPqSearch(index, emb, queries, "vec_id", "embedding",
      topK = 5, nprobe = 4, rerank = 50)
    // execute THIS plan instance (out.count() would run a derived one and
    // leave these metrics at zero — same pitfall PlanAudit documents)
    out.queryExecution.executedPlan.execute().count()
    val plan = out.queryExecution.executedPlan.toString
    plan.linesIterator.filter(_.contains("PartitionFilters")).foreach { l =>
      val i = l.indexOf("PartitionFilters")
      println("PROBE " + l.slice(i, i + 200))
    }
    // ground truth from the scan metrics: partitions the codes scan touched
    def leaves(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        leaves(a.executedPlan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case other => (other.children ++ other.subqueries).flatMap(leaves)
    }
    leaves(out.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("codes")))
      .foreach { s =>
        println(s"PROBE codes scan: partitions read = " +
          s"${s.metrics.get("numPartitions").map(_.value)} " +
          s"files read = ${s.metrics.get("numFiles").map(_.value)}")
      }
    // Same audit for plain ivfSearch, whose assigned relation relies on
    // DYNAMIC pruning (its probe side IS a filtered parquet scan, which the
    // DPP rule accepts — unlike the LocalRelation above).
    val ivf = Similarity.ivfSearch(Td.ivfIndexTable(spark, sfDir), queries,
      "vec_id", "embedding", k = 5, nprobe = 4)
    ivf.queryExecution.executedPlan.execute().count()
    ivf.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("PartitionFilters")).foreach { l =>
        val i = l.indexOf("PartitionFilters")
        println("PROBE ivf " + l.slice(i, i + 200))
      }
    spark.stop()
  }
}
