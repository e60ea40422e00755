package graft.examples
import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named queries to files — the r18
  * optimization round's plan evidence (`plans/r18/<q>_{before,after}.txt`).
  *
  * Usage: runMain graft.examples.PlanFmt <sfDir> <outDir> <suffix> <q...>
  * Writes <outDir>/<q>_<suffix>.txt per query. Uses local[32] + 32 shuffle
  * partitions to match the bench session's planner inputs (AQE plans print
  * isFinalPlan=false — the initial plan, which is what explain() gives
  * before execution; Exchange count/join strategy/PushedFilters are all
  * visible there).
  */
object PlanFmt {
  def main(args: Array[String]): Unit = {
    val Array(d, outDir, suffix, qs @ _*) = args: @unchecked
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    for (q <- qs) {
      val df = SparkEntry.queries(q)(spark, d)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${q}_$suffix.txt"), txt)
      println(s"wrote $outDir/${q}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
