package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Co-located (shuffle-free) equi-joins via Spark's native bucketed tables.
  *
  * The 100 TB problem: a repeated equi-join between two large tables
  * shuffles BOTH sides on every run — at scale the exchange, not the join,
  * is the cost. Spark's declarative answer is bucketed storage: write each
  * side once with `bucketBy(B, keys)`; scans of both tables then report
  * `HashPartitioning(keys, B)` and Catalyst plans the SortMergeJoin with NO
  * Exchange on either side. The one-time bucketed write is amortized over
  * every subsequent join — exactly the economics of the reference's keyed
  * warehouse sinks, which exist so downstream reporting reads stay cheap
  * (reference `README.md:12-15`: ingest → load structured tables →
  * auto-refreshed aggregate reporting).
  *
  * A driver-side per-bucket union-of-joins was considered and REJECTED:
  * Catalyst doesn't know two single-bucket scans are co-partitioned, so
  * each union branch plans its own exchanges — that shape chops one big
  * shuffle into B small ones (plus O(B) plan nodes) instead of removing
  * it. The bucketed-table route is also why [[KeyedTable]] gained
  * [[KeyedTable.materializeBucketed]]: its manifest layout optimizes
  * incremental merge (bucket-pruned rewrites), while repeated large-scale
  * joins want this export. The two layouts share the SAME bucket hash
  * (murmur3 pmod B), so the export's shuffle routes rows exactly where the
  * table's merge routing already had them.
  */
object Colocate {

  /** Bucketed materialization into the session catalog, one file per
    * bucket: the pre-write `repartition(buckets, keys)` uses the same
    * murmur3-pmod hash `bucketBy` buckets with, so every writer task holds
    * exactly one bucket and writes exactly one file. Without it each of
    * the N input tasks writes a file per bucket it sees — N·B small files,
    * slower scans, and a defeated `sortBy` (Spark only treats a bucket as
    * sorted when it holds a single file). `path` pins the data location
    * (external table) so callers control placement and lifetime; the
    * catalog entry itself is per-session, in-memory.
    */
  def materialize(df: DataFrame, name: String, keys: Seq[String], buckets: Int,
                  path: Option[String] = None): Unit = {
    require(keys.nonEmpty && buckets > 0, "bucketed materialization needs keys and buckets")
    val w0 = df.repartition(buckets, keys.map(col).toIndexedSeq: _*)
      .write.format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
    path.fold(w0)(p => w0.option("path", p)).saveAsTable(name)
  }

  /** Join two bucketed tables on their bucket keys. The `merge` hint pins
    * the SortMergeJoin strategy so the co-location claim is falsifiable:
    * a small side must not silently degrade the gate into a broadcast
    * (which has no shuffle either, but proves nothing about bucketing).
    */
  def bucketedJoin(s: SparkSession, left: String, right: String,
                   keys: Seq[String], joinType: String = "inner"): DataFrame =
    s.table(left).hint("merge").join(s.table(right), keys, joinType)

  /** Aggregate a bucketed table on (a superset of) its bucket keys: the
    * scan reports `HashPartitioning(keys, B)`, so the partial and final
    * hash aggregates collapse into ONE stage with no Exchange — the
    * group-by twin of [[bucketedJoin]]. At 100 TB this is the difference
    * between an aggregation that re-shuffles the fact table on every
    * dashboard refresh and one that only ever reads its buckets.
    * `aggExprs` are ordinary aggregate Columns.
    */
  def bucketedAggregate(s: SparkSession, table: String, keys: Seq[String],
                        aggExprs: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(keys.nonEmpty && aggExprs.nonEmpty, "need keys and aggregates")
    s.table(table).groupBy(keys.map(col): _*).agg(aggExprs.head, aggExprs.tail: _*)
  }

  /** Shuffle exchanges in the EXECUTED plan — the observability hook the
    * co-location gates pin to zero. Executes the frame once (AQE finalizes
    * the plan only on execution), then counts shuffle flavors in the final
    * plan section; broadcast exchanges are deliberately not counted (the
    * `merge` hint above keeps them out of gated plans anyway).
    */
  def exchangeCount(df: DataFrame): Int = {
    val qe = df.queryExecution
    qe.executedPlan.execute().count()
    val plan = qe.executedPlan.toString.split("== Initial Plan ==")(0)
    "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r.findAllIn(plan).size
  }
}
