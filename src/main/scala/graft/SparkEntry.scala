package graft

import graft.queries.{BpeQueries, GraphQueries, MiscQueries, ParityQueries, RelationalQueries, StatQueries, TextQueries, VectorQueries, WebQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator (SURVEY §2 + extension
  * ops); `oracleSql` holds the DuckDB-equivalent SQL for each (omitted only
  * for ops not expressible in portable SQL → rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the reference's §2.4 aggregation battery (fact⋈dim⋈nation, 17 aggregates).
    */
  def entry(spark: SparkSession): DataFrame =
    ParityQueries.defs("q_agg_battery").fn(spark, "/root/testdata/sf0.001")

  private def all: Map[String, ParityQueries.Q] =
    ParityQueries.defs ++ TextQueries.defs ++ VectorQueries.defs ++
      MiscQueries.defs ++ RelationalQueries.defs ++ StatQueries.defs ++
      GraphQueries.defs ++ WebQueries.defs ++ BpeQueries.defs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }

  def oracleSql: Map[String, String] =
    all.collect { case (k, q) if q.oracle.isDefined => k -> q.oracle.get }
}
