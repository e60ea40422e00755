package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Anti-entropy audit for maintained state — the operational tool every
  * IVM deployment runs besides its maintainers: compare a maintained
  * table's CURRENT rows against an independently-derived expected relation
  * and report exactly where they diverge. The maintenance family
  * (AggDelta/JoinDelta/Scd2/TopKDelta/DistinctState) guarantees
  * delta-applied ≡ recomputed only while its contracts hold (correct
  * before-images, exactly-once epochs); this is the production check that
  * CATCHES a contract breach after the fact, scoped so it can run on a
  * schedule against 100 TB state: the compare is one co-keyed full-outer
  * join, output size ∝ divergence (agreeing keys emit nothing), and the
  * expected side can be restricted to any key slice for sampled audits.
  */
object Audit {

  /** Per-key differences between `table.current` and `expected`, classified:
    *  - `missing` — expected has the key, the maintained table does not;
    *  - `extra`   — the maintained table has a key nothing expects;
    *  - `drift`   — both sides have the key but a shared non-key column
    *                differs (null-safe compare, column list reported).
    * Agreeing keys produce NO row. Compared columns = shared non-key
    * columns present on both sides; columns private to one side are
    * ignored (they cannot be audited without an expectation).
    */
  def viewDiff(table: KeyedTable, expected: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need key columns")
    val cur = table.current
    val shared = cur.columns.filter(expected.columns.contains).filterNot(keys.contains).toSeq
    val l = cur.select((keys ++ shared).map(col): _*)
      .withColumn("__in_view", lit(1))
    val r = expected.select((keys ++ shared).map(col): _*)
      .withColumn("__in_exp", lit(1))
    val renamedR = shared.foldLeft(r)((df, c) => df.withColumnRenamed(c, s"__e_$c"))
    val j = l.join(renamedR, keys, "full_outer")
    val driftCols: Column = shared
      .map(c => when(!(col(c) <=> col(s"__e_$c")), lit(c)))
      .foldLeft(array())((acc, c) => concat(acc, array(c)))
    val cls = when(col("__in_view").isNull, lit("missing"))
      .when(col("__in_exp").isNull, lit("extra"))
      .otherwise(lit("drift"))
    j.withColumn("__drift", filter(driftCols, x => x.isNotNull))
      .filter(col("__in_view").isNull || col("__in_exp").isNull ||
        size(col("__drift")) > 0)
      .select(keys.map(col) ++ Seq(cls.as("diff_class"),
        col("__drift").as("drift_columns")): _*)
  }

  /** One-row audit summary: total keys per side, diff counts by class, and
    * `audit_ok` = 1 iff the maintained table exactly reproduces the
    * expectation. The shape a scheduled job alerts on.
    */
  def viewAudit(table: KeyedTable, expected: DataFrame, keys: Seq[String]): DataFrame = {
    val diffs = viewDiff(table, expected, keys)
      .groupBy("diff_class").agg(count(lit(1)).as("n"))
    val counts = table.current.agg(count(lit(1)).as("n_view"))
      .crossJoin(expected.agg(count(lit(1)).as("n_expected")))
    def cls(name: String): Column =
      coalesce(max(when(col("diff_class") === name, col("n"))), lit(0L))
    val sums = diffs.agg(cls("missing").as("n_missing"), cls("extra").as("n_extra"),
      cls("drift").as("n_drift"))
    counts.crossJoin(sums)
      .withColumn("audit_ok",
        (col("n_missing") === 0 && col("n_extra") === 0 && col("n_drift") === 0)
          .cast("int"))
  }
}
