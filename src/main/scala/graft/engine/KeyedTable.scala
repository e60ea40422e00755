package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets

/** Keyed upsert table — the one genuinely custom physical piece (SURVEY §4).
  *
  * The reference writes flagged rows into warehouse tables keyed on a business
  * key with `insertable:true, updateable:true, deletable:false,
  * upsertable:false` (reference `dataflow/New_BookingTransformation.json:
  * 142-179` for `fact_booking` on `booking_id`; `pipeline/
  * New_LoadCustomerDim.json:82-101` for `dim_customer` on `customer_id`).
  * With no Delta/Iceberg jars available, we implement keyed merge over
  * versioned parquet snapshots:
  *
  * {{{
  * root/
  *   v=1/part-*.parquet        // immutable snapshot versions
  *   v=2/part-*.parquet
  *   _CURRENT                  // pointer file containing "2"
  * }}}
  *
  * merge(batch) = dedupe batch to latest per key → current ANTI-JOIN batch
  * keys → UNION batch → write v=N+1 → swap pointer. Readers resolve the
  * pointer once and then read an immutable directory — snapshot isolation for
  * free; rename/overwrite of the small pointer file is the only commit point.
  *
  * == Scale design ==
  *  - The anti-join shuffles both sides on `keys` unless the batch is small:
  *    a CDC delta is typically ≪ the snapshot, so we anti-join against a
  *    broadcast of ONLY the batch's key columns (projected before the
  *    broadcast — a few MB even for millions of changed keys). The snapshot
  *    side then streams map-side with zero shuffle: the merge cost is one
  *    full-scan rewrite, which is the floor for copy-on-write storage.
  *  - `numBuckets`: when set, snapshots are written bucketed-by-key
  *    (`partitionBy` on a stable hash of the key) so the rewrite can be
  *    restricted to buckets containing changed keys — at 100 TB you rewrite
  *    only touched buckets, not the table. Bucket pruning happens via a
  *    partition filter on `__bucket`, which Spark prunes at planning time.
  *  - On object stores the pointer-swap commit would need a conditional-put
  *    manifest; rename is fine on HDFS/local (documented limitation).
  */
final class KeyedTable(
    val spark: SparkSession,
    val root: String,
    val keys: Seq[String],
    val orderCol: Option[String] = None,
    val numBuckets: Int = 0,
    val broadcastBatchKeys: Boolean = true,
) {
  import KeyedTable._
  private val hconf = spark.sparkContext.hadoopConfiguration
  private def fs: FileSystem = new Path(root).getFileSystem(hconf)
  private val BucketCol = "__bucket"

  def currentVersion: Long = readPointer(fs, new Path(root, CurrentMarker)).getOrElse(0L)

  def exists: Boolean = currentVersion > 0

  /** Read the current snapshot (empty-schema-less read is an error if the
    * table was never initialised — call `overwrite` first).
    */
  def current: DataFrame = {
    val v = currentVersion
    require(v > 0, s"KeyedTable at $root has no committed version")
    val df = spark.read.parquet(s"$root/v=$v")
    if (df.columns.contains(BucketCol)) df.drop(BucketCol) else df
  }

  /** Truncate-and-reload (K5): write a fresh snapshot ignoring history. */
  def overwrite(df: DataFrame): Long = commit(df)

  /** Keyed insert/update merge (K1/K2). Never deletes — matching the
    * reference's `deletable: false` (`dataflow:169-172`).
    *
    * The batch is first collapsed to its latest row per key (by `orderCol`
    * desc, nulls last) so that a feed carrying several versions of one key in
    * one batch applies only the newest — this also makes merge idempotent.
    */
  def merge(batch: DataFrame): Long = {
    val latest = orderCol match {
      case Some(oc) => Ops.latestPerKey(batch, keys, oc)
      case None     => batch.dropDuplicates(keys)
    }
    if (!exists) return commit(latest)
    commit(KeyedTable.mergePlan(current, latest, keys, broadcastBatchKeys))
  }

  private def commit(df: DataFrame): Long = {
    val next = currentVersion + 1
    val out =
      if (numBuckets > 0)
        df.withColumn(BucketCol, pmod(hash(keys.map(col).toIndexedSeq: _*), lit(numBuckets)))
          .write.partitionBy(BucketCol)
      else df.write
    out.mode("overwrite").parquet(s"$root/v=$next")
    writePointer(fs, new Path(root, CurrentMarker), next)
    next
  }
}

object KeyedTable {
  val CurrentMarker = "_CURRENT"

  /** The merge as a pure logical plan: rows of `current` whose key is NOT in
    * `batch` (anti-join against a broadcast of the batch's key columns — zero
    * shuffle of the big snapshot side), unioned with the batch. Insert+update,
    * never delete — the reference's sink contract (`dataflow:169-172`).
    * `batch` must already be deduped to one row per key.
    */
  def mergePlan(current: DataFrame, batch: DataFrame, keys: Seq[String],
                broadcastBatchKeys: Boolean = true): DataFrame = {
    val batchKeys = {
      val k = batch.select(keys.map(col).toIndexedSeq: _*)
      if (broadcastBatchKeys) broadcast(k) else k
    }
    current.join(batchKeys, keys, "left_anti")
      .unionByName(batch.select(current.columns.map(col).toIndexedSeq: _*))
  }

  def apply(spark: SparkSession, root: String, keys: Seq[String],
            orderCol: Option[String] = None, numBuckets: Int = 0): KeyedTable =
    new KeyedTable(spark, root, keys, orderCol, numBuckets)

  private def readPointer(fs: FileSystem, p: Path): Option[Long] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    }

  private def writePointer(fs: FileSystem, p: Path, v: Long): Unit = {
    val out = fs.create(p, true)
    try out.write(v.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }
}
