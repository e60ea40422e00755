package graft.engine

import org.apache.spark.sql.types._

/** Declared schemas for every table boundary in the engine.
  *
  * The reference declares fixed schemas at each dataset/dataflow boundary with
  * permissive drift (reference `dataflow/New_BookingTransformation.json:46-105`,
  * `dataset/New_BookingDataCosmosDBSource.json:10-83`,
  * `sql_queries/synapse_table_creation.sql:5-73`). We mirror that discipline:
  * one explicit [[StructType]] per boundary, PERMISSIVE parse mode at sources,
  * [[Align]] casts at sinks.
  */
object Schemas {

  /** Change-feed document schema, feed side — all dates/timestamps arrive as
    * ISO-8601 strings and `customer_id` as a string; typing happens at the sink
    * (reference `dataflow/New_BookingTransformation.json:46-69`, §1.2 of SURVEY).
    */
  val bookingRaw: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("booking_id", StringType, nullable = false),
    StructField("customer_id", StringType),
    StructField("listing_id", StringType),
    StructField("status", StringType),
    StructField("booking_created_at", StringType),
    StructField("checkin_date", StringType),
    StructField("checkout_date", StringType),
    StructField("nights", IntegerType),
    StructField("lead_time_days", IntegerType),
    StructField("guests_adults", IntegerType),
    StructField("guests_children", IntegerType),
    StructField("guests_infants", IntegerType),
    StructField("price_nightly", DoubleType),
    StructField("cleaning_fee", DoubleType),
    StructField("total_amount", DoubleType),
    StructField("currency", StringType),
    StructField("country_code", StringType),
    StructField("city", StringType),
    StructField("channel", StringType),
    StructField("device_type", StringType),
    StructField("cancellation_ts", StringType),
    StructField("cancellation_reason", StringType),
    StructField("updated_at", StringType),
  ))

  /** Fact-table target schema (reference
    * `sql_queries/synapse_table_creation.sql:27-51` and the sink `input()`
    * block `dataflow/New_BookingTransformation.json:144-168`).
    */
  val bookingFact: StructType = StructType(Seq(
    StructField("booking_id", StringType, nullable = false),
    StructField("customer_id", IntegerType),
    StructField("listing_id", StringType),
    StructField("status", StringType),
    StructField("booking_created_at", DateType),
    StructField("checkin_date", DateType),
    StructField("checkout_date", DateType),
    StructField("nights", IntegerType),
    StructField("lead_time_days", IntegerType),
    StructField("guests_adults", IntegerType),
    StructField("guests_children", IntegerType),
    StructField("guests_infants", IntegerType),
    StructField("price_nightly", DecimalType(12, 2)),
    StructField("cleaning_fee", DecimalType(12, 2)),
    StructField("total_amount", DecimalType(14, 2)),
    StructField("currency", StringType),
    StructField("country_code", StringType),
    StructField("city", StringType),
    StructField("channel", StringType),
    StructField("device_type", StringType),
    StructField("cancellation_ts", TimestampType),
    StructField("cancellation_reason", StringType),
    StructField("updated_at", TimestampType),
  ))

  /** Customer-dimension schema (reference
    * `sql_queries/synapse_table_creation.sql:5-23`). CSV arrives all-string and
    * is cast through [[Align]] — the reference's `TabularTranslator` with
    * `typeConversion: true` (`pipeline/New_LoadCustomerDim.json:94-101`).
    */
  val customerDim: StructType = StructType(Seq(
    StructField("customer_id", IntegerType, nullable = false),
    StructField("first_name", StringType, nullable = false),
    StructField("last_name", StringType, nullable = false),
    StructField("email", StringType, nullable = false),
    StructField("phone_number", StringType),
    StructField("address", StringType),
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("country", StringType),
    StructField("zip_code", StringType), // NOT int — leading zeros
    StructField("signup_date", DateType),
    StructField("last_login", TimestampType),
    StructField("total_bookings", IntegerType),
    StructField("total_spent", DecimalType(14, 2)),
    StructField("preferred_language", StringType),
    StructField("referral_code", StringType),
    StructField("account_status", StringType),
  ))

  /** Country-level aggregate table (reference
    * `sql_queries/synapse_table_creation.sql:54-72`).
    */
  val bookingAgg: StructType = StructType(Seq(
    StructField("country", StringType),
    StructField("total_bookings", LongType),
    StructField("confirmed_bookings", LongType),
    StructField("cancelled_bookings", LongType),
    StructField("total_amount", DecimalType(18, 2)),
    StructField("confirmed_amount", DecimalType(18, 2)),
    StructField("cancelled_amount", DecimalType(18, 2)),
    StructField("cancellation_rate", DoubleType),
    StructField("last_booking_date", TimestampType),
    StructField("first_booking_date", TimestampType),
    StructField("avg_amount", DoubleType),
    StructField("confirmed_avg_amount", DoubleType),
    StructField("cancelled_avg_amount", DoubleType),
    StructField("min_amount", DecimalType(18, 2)),
    StructField("max_amount", DecimalType(18, 2)),
    StructField("distinct_customers", LongType),
    StructField("avg_stay_duration", DoubleType),
  ))
}
