package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** §2.4 — the `airbnb.BookingAggregation` stored procedure re-expressed as
  * one declarative fact⋈dim groupBy (reference
  * `sql_queries/synapse_table_creation.sql:81-107`).
  *
  * Semantics pinned from the T-SQL, column by column (SURVEY §2.4):
  *  - `ISNULL(x,0)` → `coalesce(x, 0)`; `CAST(... AS FLOAT)` → double.
  *  - `cancellation_rate` keeps the div-by-zero guard.
  *  - `confirmed_avg_amount`/`cancelled_avg_amount`: CASE '''without ELSE'''
  *    → avg over the matching rows only, NULL when a group has none. Spark's
  *    `avg` skips nulls identically.
  *  - `COUNT(DISTINCT customer_id)` stays exact (not approx).
  *
  * Scale: dim is small → broadcast-hash join (explicit hint; AQE would also
  * pick it). The groupBy does partial (map-side) aggregation before the
  * single shuffle on `country`; `countDistinct` triggers Catalyst's distinct
  * rewrite (expand + two-phase agg) — the one extra shuffle here is inherent
  * to exact distinct. Everything stays inside WholeStageCodegen.
  */
object Aggregations {

  /** Incremental refresh: recompute ONLY the countries whose facts changed
    * in `batch`, and merge them into the aggregate table keyed on country —
    * the scale alternative to the reference's truncate-and-reload (K5).
    * Correct because every aggregate here is a function of a country's full
    * fact group: we re-derive those groups from the (country-pruned) fact
    * scan rather than attempting retraction arithmetic. With the fact table
    * bucketed/partitioned by a country-correlated key the scan prunes; the
    * dim side is broadcast both times.
    */
  def refreshIncremental(fact: DataFrame, dim: DataFrame, batch: DataFrame,
                         aggTable: graft.engine.KeyedTable): Long = {
    val changedCountries = batch
      .join(broadcast(dim.select("customer_id", "country")), Seq("customer_id"), "inner")
      .select("country").distinct()
    val changedFacts = fact
      .join(broadcast(dim.select("customer_id", "country")), Seq("customer_id"), "inner")
      .join(broadcast(changedCountries), Seq("country"), "left_semi")
      .drop("country")
    aggTable.merge(bookingAggregation(changedFacts, dim))
  }

  def bookingAggregation(fact: DataFrame, dim: DataFrame): DataFrame = {
    val amount = coalesce(col("total_amount"), lit(0))
    def ifStatus(s: String, v: Column): Column = when(col("status") === s, v)

    fact.join(broadcast(dim.select("customer_id", "country")), Seq("customer_id"), "inner")
      .groupBy(col("country"))
      .agg(
        count(lit(1)).as("total_bookings"),
        sum(ifStatus("Confirmed", lit(1)).otherwise(0)).as("confirmed_bookings"),
        sum(ifStatus("Cancelled", lit(1)).otherwise(0)).as("cancelled_bookings"),
        sum(amount).cast("decimal(18,2)").as("total_amount"),
        sum(ifStatus("Confirmed", amount).otherwise(0)).cast("decimal(18,2)").as("confirmed_amount"),
        sum(ifStatus("Cancelled", amount).otherwise(0)).cast("decimal(18,2)").as("cancelled_amount"),
        when(count(lit(1)) === 0, lit(0.0))
          .otherwise(sum(ifStatus("Cancelled", lit(1)).otherwise(0)).cast("double") /
            count(lit(1)).cast("double")).as("cancellation_rate"),
        max(col("booking_created_at")).cast("timestamp").as("last_booking_date"),
        min(col("booking_created_at")).cast("timestamp").as("first_booking_date"),
        avg(amount.cast("double")).as("avg_amount"),
        avg(ifStatus("Confirmed", amount.cast("double"))).as("confirmed_avg_amount"),
        avg(ifStatus("Cancelled", amount.cast("double"))).as("cancelled_avg_amount"),
        min(amount).cast("decimal(18,2)").as("min_amount"),
        max(amount).cast("decimal(18,2)").as("max_amount"),
        countDistinct(col("customer_id")).as("distinct_customers"),
        avg(coalesce(col("nights"), lit(0)).cast("double")).as("avg_stay_duration"),
      )
  }
}
