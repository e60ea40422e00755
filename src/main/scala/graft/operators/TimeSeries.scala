package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-grid time-series alignment over an event stream.
  *
  * The reference's fact rows carry event-time columns (`booking_date`,
  * `updated_at` — `dataflow/New_BookingTransformation.json:149-151,160-162`)
  * and its aggregate table is a calendar rollup; a production pipeline built
  * on the same data immediately needs the inverse operation too: put an
  * irregular event stream onto a regular grid (for charting, feature
  * windows, training tensors), materializing the empty buckets and carrying
  * the last observation forward across them.
  */
object TimeSeries {

  private def stepInterval(unit: String): Column = unit match {
    case "day"    => expr("interval 1 day")
    case "hour"   => expr("interval 1 hour")
    case "minute" => expr("interval 1 minute")
    case other    => throw new IllegalArgumentException(s"unsupported grid unit: $other")
  }

  /** Resample `df` onto a per-key `unit` grid with gap materialization and
    * forward fill:
    *
    *  1. bucket rows to `date_trunc(unit, ts)` and aggregate per
    *     (key, bucket) — row count plus an exact value sum (decimal
    *     accumulation, one cast to double at the end, so results are
    *     order-independent under any partitioning);
    *  2. build each key's full bucket spine between its first and last
    *     bucket with `sequence(...)` + `explode` — generated map-side from
    *     a 2-column per-key aggregate, never a driver-side loop;
    *  3. left-join the observed buckets onto the spine (gaps surface as
    *     NULL aggregates / zero counts);
    *  4. forward-fill with `last(_, ignoreNulls)` over an
    *     unbounded-preceding row window per key.
    *
    * Scale: the two shuffles are (key, bucket) for the aggregate and key
    * for the spine/window; both are pre-reduced — the join and window run
    * on bucket-grain rows (keys × grid length), not raw events, so a 100 TB
    * event table collapses to its bucket count before anything wide
    * happens. Spine width is bounded by the observed per-key time range;
    * a key idle for years costs rows proportional to the grid, which is
    * the operator's contract (gap rows are the product).
    */
  def resampleFill(df: DataFrame, keyCol: String, tsCol: String, unit: String,
                   valueCol: String): DataFrame = {
    val bucketed = df
      .groupBy(col(keyCol), date_trunc(unit, col(tsCol)).as("bucket"))
      .agg(
        count(lit(1)).as("n_obs"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("bucket_value"))
    val spine = bucketed
      .groupBy(col(keyCol))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col(keyCol),
        explode(sequence(col("b0"), col("b1"), stepInterval(unit))).as("bucket"))
    val w = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(bucketed, Seq(keyCol, "bucket"), "left")
      .select(
        col(keyCol), col("bucket"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("bucket_value"),
        last(col("bucket_value"), ignoreNulls = true).over(w).as("value_ffill"))
  }
}
