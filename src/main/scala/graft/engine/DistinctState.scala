package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental DISTINCT-count maintenance — the non-retractable counterpart
  * to [[AggDelta]]: distinct counts cannot be maintained by retraction
  * arithmetic (removing a value's last occurrence is not observable from
  * counts alone), but they ARE insert-monotone, so per-group HyperLogLog
  * sketches (Spark's built-in DataSketches integration — codegen'd,
  * map-side-combining) make the state mergeable: each batch sketches once,
  * unions into the stored registers, and the estimate reads off the state
  * without ever recounting the corpus.
  *
  * State table layout: group columns (the KeyedTable keys) + `hll` (binary
  * sketch, ~2^lgK bytes). Contracts:
  *  - inserts only — a delete cannot shrink a sketch; feeds with deletes
  *    keep exact distinct on the re-derivation path
  *    ([[Aggregations.refreshIncremental]]) or accept monotone counts.
  *  - exactly-once per batch via the version-tag guard, as in
  *    [[AggDelta.maintain]]. Re-unioning the same batch is SET-wise a
  *    no-op but not bit-invariant (DataSketches' union can shift the
  *    sketch's internal representation and nudge the estimate a fraction
  *    of a percent — spec-measured), so the tag is what makes redelivery
  *    exactly invariant, beyond keeping the cost down.
  *  - estimates carry DataSketches' standard error (~1.04/√2^lgK; lgK 12 →
  *    ≈1.6%) — the gated query pins the bound against an exact twin.
  */
object DistinctState {

  /** Per-group sketch of one frame — the map-side-combined single shuffle. */
  def sketch(df: DataFrame, groups: Seq[String], valueCol: String,
             lgK: Int = 12): DataFrame =
    df.groupBy(groups.map(col).toIndexedSeq: _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))

  /** Build (or rebuild) the state table from a full scan. */
  def bootstrap(state: KeyedTable, facts: DataFrame, groups: Seq[String],
                valueCol: String, lgK: Int = 12): Long =
    state.overwrite(sketch(facts, groups, valueCol, lgK))

  /** Union one batch of new rows into the stored sketches. Cost ∝ batch
    * (sketch) + touched groups (bucket-pruned state read + rewrite); one
    * atomic version via [[KeyedTable.mergeCdc]].
    */
  def maintain(state: KeyedTable, batch: DataFrame, groups: Seq[String],
               valueCol: String, lgK: Int = 12,
               batchId: Option[String] = None): Long = {
    require(state.exists, "bootstrap the distinct-state table before maintaining it")
    if (batchId.isDefined && state.lastTag == batchId) return state.currentVersion
    // pinned for the same reason as AggDelta.maintain's deltas: the sketch
    // rows are ≤ touched groups, and every downstream consumer would
    // otherwise re-sketch the whole batch
    val deltas = sketch(batch, groups, valueCol, lgK).localCheckpoint()
    val curTouched = state.currentForKeys(deltas)
      .withColumnRenamed("hll", "__hll_old")
    val merged = deltas.join(curTouched, groups, "left_outer").select(
      (groups.map(col) ++ Seq(
        when(col("__hll_old").isNull, col("hll"))
          .otherwise(hll_union(col("hll"), col("__hll_old"))).as("hll"),
        lit("U").as("_op"), lit(1L).as("_seq"))).toIndexedSeq: _*).localCheckpoint()
    state.mergeCdc(merged, tag = batchId)
  }

  /** Read the estimates off a state snapshot — no data scan, just the
    * (groups × sketch) rows.
    */
  def estimate(stateDf: DataFrame, groups: Seq[String]): DataFrame =
    stateDf.select((groups.map(col) :+
      hll_sketch_estimate(col("hll")).as("distinct_est")).toIndexedSeq: _*)
}
