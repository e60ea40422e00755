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
/** Exact epoch microseconds from a Timestamp — `getTime` alone truncates to
  * ms (floorDiv keeps pre-1970 values correct; getNanos carries the
  * sub-second part). THE shared definition for row-level gap/order code; the
  * column-level twin is `unix_micros`. A standalone object so closures in
  * OTHER objects' methods reach it as a static call — a method on the
  * enclosing object would make the lambda capture that (non-serializable)
  * object as `this`.
  */
private[graft] object TimeUtil {
  def epochMicros(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
}

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

  /** Ordered funnel over an event stream: per key, the earliest `steps(0)`
    * event, then the earliest `steps(1)` event STRICTLY AFTER it, and so on
    * — one row per key that entered the funnel, with per-step timestamps
    * (null from the first broken step onward) and a completed-step count.
    *
    * Each stage filters the stream to one event type BEFORE joining the
    * (key, prior-step-time) relation — so stage i shuffles only that type's
    * rows plus a keys-sized build side, never the whole stream, and each
    * aggregate is map-side combinable min(). Stage count = funnel length
    * (fixed, small); no per-key sort and no window state.
    */
  def funnel(df: DataFrame, keyCol: String, typeCol: String, tsCol: String,
             steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = df.filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("t_1"))
    val stages = steps.zipWithIndex.tail.scanLeft(first) {
      case (prev, (step, i)) =>
        df.filter(col(typeCol) === step)
          .join(prev.select(col(keyCol), col(s"t_$i")), keyCol)
          .filter(col(tsCol) > col(s"t_$i"))
          .groupBy(col(keyCol)).agg(min(col(tsCol)).as(s"t_${i + 1}"))
    }
    val joined = stages.zipWithIndex.tail.foldLeft(stages.head) {
      case (acc, (stage, i)) =>
        acc.join(stage.select(col(keyCol), col(s"t_${i + 1}")), Seq(keyCol), "left")
    }
    val completed = (2 to steps.length).foldLeft(lit(1)) {
      case (acc, i) => acc + when(col(s"t_$i").isNotNull, 1).otherwise(0)
    }
    joined.withColumn("steps_completed", completed.cast("int"))
  }

  /** Debounce: drop events closer than `minGapSeconds` to the PREVIOUS event
    * of the same key (first event per key always kept). Pure one-window
    * formulation — `lag` over (key, ts, tie) — so it stays a single shuffle
    * and survives any data scale; the gap compares exact epoch microseconds.
    *
    * Note the semantics: the gap is measured to the previous RAW event, not
    * the previous KEPT one (true rate-limiting against the kept stream is
    * inherently sequential per key — that lives in streaming state ops, not
    * here — but predecessor-debounce is the common log-cleanup contract and
    * is engine-portable).
    */
  def debounce(df: DataFrame, keyCols: Seq[String], tsCol: String,
               tieCol: String, minGapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val prevUs = lag(unix_micros(col(tsCol)), 1).over(w)
    df.withColumn("__prev_us", prevUs)
      .filter(col("__prev_us").isNull ||
        unix_micros(col(tsCol)) - col("__prev_us") >= minGapSeconds * 1000000L)
      .drop("__prev_us")
  }

  /** Calendar dimension spanning the observed day range of `tsCol`: one row
    * per day with the attributes a star schema hangs rollups on. Generated
    * distributed (`sequence` + `explode` from a 2-value aggregate) — the
    * standard warehouse date-dim build without a driver-side loop.
    *
    * Day-of-week is pinned to ISO (Mon=1..Sun=7) via arithmetic on Spark's
    * Sunday-first `dayofweek`, so the column is engine-portable.
    */
  def calendarDim(df: DataFrame, tsCol: String): DataFrame = {
    val span = df.agg(
      date_trunc("day", min(col(tsCol))).as("d0"),
      date_trunc("day", max(col(tsCol))).as("d1"))
    val isodow = (dayofweek(col("dt")) + 5) % 7 + 1
    span.select(explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("dt"))
      .select(
        col("dt"),
        year(col("dt")).as("year"),
        quarter(col("dt")).as("quarter"),
        month(col("dt")).as("month"),
        dayofmonth(col("dt")).as("day"),
        isodow.as("isodow"),
        (isodow >= 6).cast("int").as("is_weekend"))
  }

  /** First-order transition counts over a per-key event sequence: for every
    * consecutive (previous → current) type pair, the occurrence count and
    * its share among transitions leaving the previous type — the empirical
    * Markov matrix of the event stream.
    *
    * One lag window per key (single shuffle; exact epoch-µs order with a
    * tie column) then a (prev, cur) aggregate with map-side combine. The
    * share divides two exact counts, so it is engine-portable.
    */
  def transitionCounts(df: DataFrame, keyCol: String, typeCol: String,
                       tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val pairs = df
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("cur_type"))
      .agg(count(lit(1)).as("n"))
    val wPrev = Window.partitionBy("prev_type")
    pairs.withColumn("share",
      col("n").cast("double") / sum(col("n")).over(wPrev).cast("double"))
  }

  /** Cohort retention: users grouped by their first-activity day (cohort),
    * counted as retained on each later day they were active, keyed by the
    * day offset. The classic product-analytics triangle.
    *
    * Shape: one min-agg per key (cohort assignment, map-side combinable),
    * one broadcast-join back onto day-grain distinct activity, one
    * (cohort, offset) count-distinct. The distinct runs on (key, day)
    * grain — the raw stream is reduced before anything wide.
    */
  def retentionCohorts(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val days = df.select(col(keyCol),
      date_trunc("day", col(tsCol)).as("activity_day")).distinct()
    val cohorts = days.groupBy(col(keyCol))
      .agg(min(col("activity_day")).as("cohort_day"))
    days.join(broadcast(cohorts), Seq(keyCol))
      .withColumn("day_offset", datediff(col("activity_day"), col("cohort_day")).cast("int"))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** True rate-limit: keep an event only if it is ≥ `minGapSeconds` after
    * the previous KEPT event of the same key — the sequential semantics
    * [[debounce]] deliberately doesn't provide (three events 1 s apart with
    * a 2 s gap: debounce keeps {1}, throttle keeps {1, 3}).
    *
    * The kept-state scan is inherently sequential per key, so this is the
    * documented `flatMapGroups` escape hatch: one shuffle on the key, then
    * a pure-Scala in-memory pass over each key's sorted events. Memory
    * bound = one key's rows per task (same envelope as any per-key window
    * sort); the streaming twin with cross-batch state is
    * `StreamOps.throttleStream`.
    */
  def throttle(df: DataFrame, keyCols: Seq[String], tsCol: String,
               tieCol: String, minGapSeconds: Long): DataFrame = {
    val schema = df.schema
    val tsIdx = schema.fieldIndex(tsCol)
    val tieIdx = schema.fieldIndex(tieCol)
    val keyIdx = keyCols.map(schema.fieldIndex)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    // Group key: null-vs-"null" safe (typed prefix per part, control-char
    // separator, both as ASCII escapes so the source stays text).
    def keyOf(r: org.apache.spark.sql.Row): String = keyIdx.map { i =>
      val v = r.get(i)
      if (v == null) "\u0000" else "\u0001" + v
    }.mkString("\u0002")
    def micros(r: org.apache.spark.sql.Row): Long = TimeUtil.epochMicros(r.getTimestamp(tsIdx))
    // Tie ordering on the column's NATURAL ordering (every orderable atomic
    // Spark type surfaces as a java.lang.Comparable), nulls first like a SQL
    // asc sort — the previous Number cast threw on string/timestamp ties and
    // NPE'd on null tie values, stricter than the Column-based debounce twin.
    // Allowlist, not denylist: every type here surfaces as a Comparable
    // external value, so the reject happens at plan build instead of as a
    // ClassCastException inside an executor task (CalendarInterval, arrays,
    // maps, structs, binary all fall through to the error).
    val tieType = schema(tieIdx).dataType
    val tieComparable = tieType match {
      case _: org.apache.spark.sql.types.NumericType => true
      case org.apache.spark.sql.types.StringType | org.apache.spark.sql.types.BooleanType |
           org.apache.spark.sql.types.DateType | org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    }
    require(tieComparable,
      s"throttle tie column '$tieCol' must be an orderable atomic type, got $tieType")
    val tieOrd: Ordering[Any] = Ordering.fromLessThan { (a, b) =>
      if (a == null) b != null
      else if (b == null) false
      else a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    }
    df.groupByKey(keyOf)(org.apache.spark.sql.Encoders.STRING)
      .flatMapGroups { (_, it) =>
        val rows = it.toVector.sortBy { r =>
          (micros(r), r.get(tieIdx))
        }(Ordering.Tuple2(Ordering.Long, tieOrd))
        var lastKeptUs = Long.MinValue
        rows.iterator.filter { r =>
          val t = micros(r)
          val keep = lastKeptUs == Long.MinValue || t - lastKeptUs >= minGapSeconds * 1000000L
          if (keep) lastKeptUs = t
          keep
        }
      }(enc)
  }

  /** Per-key rolling z-score over the trailing `window` observations
    * (current row inclusive), ordered by (`tsCol`, `tieCol`) — the streaming
    * anomaly gate for metric feeds: flag a point when it sits more than
    * `threshold` population standard deviations from its own recent mean.
    *
    * Determinism recipe (Stats scaladoc): the frame's first and second
    * moments accumulate as DECIMAL sums — exact, so the value is independent
    * of how either engine associates the frame additions (DuckDB's
    * segment-tree sliding-window aggregation reassociates freely; float sums
    * would diverge in the low bits) — and one double closed form
    * `(Σx² − (Σx)²/n)/n` runs at the end. `z` is NULL until `minObs`
    * observations fill the frame or when the frame variance is 0.
    *
    * The decimal cast QUANTIZES the moment inputs to `decimalScale` decimal
    * places (same domain assumption `Stats.correlation` documents): values
    * whose variation lives below that scale collapse to std 0 and can never
    * flag — while the z numerator uses the unrounded double. Raise
    * `decimalScale` for fine-grained domains (each extra digit spends one of
    * decimal(18,·)'s integer digits; at scale s the frame sum must fit
    * 10^(18−s)). The streaming twin accumulates raw doubles and agrees only
    * where the domain genuinely is ≤ `decimalScale` places.
    *
    * One shuffle on the key, one per-key sort, single-pass frame evaluation;
    * window width is a row-count constant so executor state is O(window) per
    * open frame. Skewed keys bound the stage (a window over one key cannot
    * salt); at 100 TB cap per-key cardinality upstream (`capPerGroup`) or
    * bucket the table on the key to pre-sort the exchange away.
    */
  def rollingZscore(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
                    valueCol: String, window: Int, minObs: Int = 2,
                    threshold: Double = 3.0, decimalScale: Int = 2): DataFrame = {
    require(window >= 2, "window must cover at least 2 rows")
    require(minObs >= 2 && minObs <= window, "need 2 <= minObs <= window")
    require(decimalScale >= 0 && decimalScale <= 16, "need 0 <= decimalScale <= 16")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-(window - 1), Window.currentRow)
    val vd = col(valueCol).cast(s"decimal(18,$decimalScale)")
    // All three frame aggregates in ONE projection so CollapseWindow plans
    // a single Window node (one pass over each sorted partition) — the
    // withColumn-chain form left three stacked Windows in the plan.
    val withMoments = df.select(col("*"),
      count(vd).over(w).as("n_obs"),
      sum(vd).over(w).cast("double").as("__s"),
      sum(vd * vd).over(w).cast("double").as("__ss"))
    val nD = col("n_obs").cast("double")
    val mean = col("__s") / nD
    // clamp at 0: the exact decimal sums round to double once each, so the
    // closed form can land a few ulps negative and sqrt would emit NaN
    // (which DuckDB and Java may render differently) — clamped, both
    // engines agree on std = 0 → z NULL
    val variance = greatest((col("__ss") - col("__s") * col("__s") / nD) / nD, lit(0.0))
    withMoments
      .withColumn("roll_mean", mean)
      .withColumn("roll_std", sqrt(variance))
      .withColumn("zscore",
        when(col("n_obs") >= minObs && col("roll_std") > 0.0,
          (col(valueCol).cast("double") - col("roll_mean")) / col("roll_std")))
      .withColumn("anomaly", coalesce(abs(col("zscore")) > threshold, lit(false)))
      .drop("__s", "__ss")
  }
}
