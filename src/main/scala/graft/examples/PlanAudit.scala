package graft.examples
import graft.SparkEntry
import org.apache.spark.sql.SparkSession
/** Dump executedPlan summaries for every registered query — a quick audit of
  * pushdown (PushedFilters/ReadSchema), join strategies, and codegen spans.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    // optional: `runMain graft.examples.PlanAudit <dir> q_a q_b` audits only
    // the named queries — lets the lint run at EXPENSIVE scales for a
    // suspect key without paying the full battery
    val wanted = args.drop(1).toSet
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted(n) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, d)
        // Execute THIS plan (df.count() would execute a derived one): AQE
        // finalizes its stages and the printout shows real codegen spans.
        val qe = df.queryExecution
        qe.executedPlan.execute().count()
        // A finalized AQE plan prints BOTH "== Final Plan ==" and
        // "== Initial Plan ==" sections — keep only the final one, or every
        // regex counter below double-counts (and dead initial-plan joins,
        // e.g. an AQE-demoted SortMergeJoin, would be reported as executed).
        val plan = qe.executedPlan.toString.split("== Initial Plan ==")(0)
        val joins = "(BroadcastHashJoin|SortMergeJoin|BroadcastNestedLoopJoin|ShuffledHashJoin|CartesianProduct)".r
          .findAllIn(plan).toSeq.groupBy(identity).map { case (k, v) => s"$k×${v.size}" }.mkString(", ")
        val scans = "ReadSchema: [^\n]*".r.findAllIn(plan).toSeq.map(_.take(110))
        val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).toSeq.distinct.map(_.take(110))
        val exchanges = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r.findAllIn(plan).size
        val codegen = plan.linesIterator.count(_.contains("*("))
        // the two r16 optimizer-law lints (single-partition BNL,
        // filter-repeated-subtree) — also enforced in CI by PlanLintSpec
        val lint = graft.plans.PlanLint.lint(qe.executedPlan,
          spark.sparkContext.defaultParallelism)
        println(s"AUDIT $name | joins: ${if (joins.isEmpty) "-" else joins} | exchanges: $exchanges | codegen lines: $codegen | lint: ${lint.size}")
        lint.foreach(f => println(s"      $f"))
        pushed.foreach(p => println(s"      $p"))
        scans.foreach(sc => println(s"      $sc"))
      } catch { case e: Throwable => println(s"AUDIT $name FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
