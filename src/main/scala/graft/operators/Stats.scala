package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution statistics for data-quality gating: robust outlier flags,
  * fixed-width histograms, and an exact correlation/regression battery.
  *
  * Everything here is engine-portable by construction (the driver
  * hash-compares against a DuckDB oracle): location/scale estimates use
  * exact interpolated percentiles (bit-identical to `quantile_cont`), and
  * second-moment statistics accumulate in DECIMAL — exact and
  * order-independent — before one final double-precision formula. No float
  * `avg`/`stddev` aggregates (partition-order-dependent) and no
  * transcendental functions (libm-dependent) appear in any output.
  */
object Stats {

  /** Backtick-quote an identifier for the `expr(...)` SQL fragments below —
    * exact `percentile` has no Column-form API, so the column name passes
    * through SQL text and names with spaces/dots would otherwise break or
    * resolve as a nested-field path.
    */
  private def qid(name: String): String = "`" + name.replace("`", "``") + "`"

  /** Per-group robust outlier flags on `valueCol`:
    *
    *  - Tukey fences: outside `[Q1 - kIqr·IQR, Q3 + kIqr·IQR]`;
    *  - MAD rule: `|x - median| > kMad · 1.4826 · MAD` where
    *    `MAD = median(|x - median|)` (1.4826 rescales MAD to σ under
    *    normality).
    *
    * Two aggregate passes (quartiles, then MAD of residuals) with the
    * group-level statistics broadcast back onto the rows — the wide side
    * is never shuffled, so this scales with the row count regardless of
    * how few groups there are. Exact percentiles hold the whole group's
    * values per aggregation state, which is the right trade below ~10⁸
    * rows per group; beyond that, swap `percentile` for
    * `approx_percentile` and drop the oracle to rows-only.
    */
  def robustOutliers(df: DataFrame, groupCol: String, valueCol: String,
                     kIqr: Double = 1.5, kMad: Double = 3.0): DataFrame = {
    val v = col(valueCol).cast("double")
    val quartiles = df.groupBy(col(groupCol)).agg(
      expr(s"percentile(${qid(valueCol)}, 0.25)").as("q1"),
      expr(s"percentile(${qid(valueCol)}, 0.5)").as("med"),
      expr(s"percentile(${qid(valueCol)}, 0.75)").as("q3"))
    val withQ = df.join(broadcast(quartiles), Seq(groupCol))
    val madAgg = withQ.groupBy(col(groupCol))
      .agg(expr(s"percentile(abs(${qid(valueCol)} - med), 0.5)").as("mad"))
    val iqr = col("q3") - col("q1")
    withQ.join(broadcast(madAgg), Seq(groupCol))
      .withColumn("iqr_outlier",
        v < col("q1") - lit(kIqr) * iqr || v > col("q3") + lit(kIqr) * iqr)
      .withColumn("mad_outlier",
        col("mad") > lit(0.0) &&
          abs(v - col("med")) > lit(kMad) * lit(1.4826) * col("mad"))
  }

  /** Fixed-width histogram of `valueCol` over `bins` equal buckets spanning
    * the global [min, max]. The max lands in the last bucket (`least`).
    *
    * One narrow agg for the range (broadcast back as a 1-row literal), one
    * map-side bin assignment, one pre-combined groupBy over at most `bins`
    * keys — the reduction happens before the shuffle, so the exchange
    * carries ≤ `bins` rows per map partition no matter the input size.
    */
  def histogram(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    require(bins > 0, "bins must be positive")
    val range = df.agg(
      min(col(valueCol)).cast("double").as("lo"),
      max(col(valueCol)).cast("double").as("hi"))
    val x = col(valueCol).cast("double")
    val width = (col("hi") - col("lo")) / lit(bins)
    // degenerate range (all values equal): width 0 makes the division NULL
    // and least() would skip the NULL into bin bins-1 — pin it to bin 0
    df.crossJoin(broadcast(range))
      .select(
        when(col("hi") === col("lo"), lit(0))
          .otherwise(least(lit(bins - 1), floor((x - col("lo")) / width)))
          .cast("int").as("bin"),
        col("lo"), col("hi"))
      .groupBy("bin", "lo", "hi")
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("bin"),
        (col("lo") + col("bin") * (col("hi") - col("lo")) / lit(bins)).as("bin_lo"),
        (col("lo") + (col("bin") + 1) * (col("hi") - col("lo")) / lit(bins)).as("bin_hi"),
        col("cnt"))
  }

  /** Equi-depth bucketing: assign each row the quantile bucket of
    * `valueCol` among `buckets` buckets cut at exact interpolated
    * percentiles (k/buckets for k in 1..buckets-1). Unlike `ntile` (which
    * needs a global sort and splits ties arbitrarily by row position), the
    * cut-point formulation is value-deterministic — equal values always
    * land in the same bucket — and costs one tiny aggregate broadcast back
    * onto a map-side projection instead of a total order.
    */
  def quantileBuckets(df: DataFrame, valueCol: String, buckets: Int): DataFrame = {
    require(buckets > 1, "need at least 2 buckets")
    val cuts = (1 until buckets).map(k =>
      expr(s"percentile(${qid(valueCol)}, ${k.toDouble / buckets})").as(s"c$k"))
    val bounds = df.agg(cuts.head, cuts.tail: _*)
    val bucket = (1 until buckets).map(k =>
      when(col(valueCol).cast("double") > col(s"c$k"), 1).otherwise(0))
      .reduce(_ + _)
    df.crossJoin(broadcast(bounds))
      .withColumn("bucket", bucket.cast("int"))
      .drop((1 until buckets).map(k => s"c$k"): _*)
  }

  /** Deterministic per-group mode of `valueCol`: the most frequent value,
    * ties broken by the smallest value. One (group, value) count aggregate
    * (map-side combined) then a group-partition top-1 window — which Spark
    * 4 rewrites to partial+final WindowGroupLimit, so each exchange carries
    * one candidate row per (partition, group).
    */
  def groupMode(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(groupCol), col(valueCol)).agg(count(lit(1)).as("cnt"))
    // asc_nulls_last: a NULL value tying for most frequent must lose to any
    // non-null mode in BOTH engines (DuckDB ASC is NULLS LAST; Spark's
    // default ASC is NULLS FIRST — left implicit they'd disagree)
    val w = Window.partitionBy(groupCol).orderBy(col("cnt").desc, col(valueCol).asc_nulls_last)
    counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(groupCol), col(valueCol).as("mode_value"), col("cnt"))
  }

  /** Per-group correlation / simple-regression battery computed from exact
    * DECIMAL power sums: n, Σx, Σy, Σxy, Σx², Σy² accumulate as
    * `decimal(12,2)` products (`decimal(25,4)`, exact — no float rounding,
    * no partition-order dependence), then one double-precision closed-form
    * per group:
    *
    *  - `corr`     = (nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²))
    *  - `slope`    = (nΣxy − ΣxΣy) / (nΣx²−(Σx)²)
    *  - `intercept`= (Σy − slope·Σx) / n
    *  - `covar_pop`= (Σxy − ΣxΣy/n) / n
    *
    * This is the map-side-combinable formulation of `corr`/`regr_*`: a
    * single pre-aggregated shuffle of six numbers per group, vs the
    * two-pass mean-centered algorithm which would rescan the input.
    * Assumes |x|,|y| < 10^10 with ≤2 decimal places of interest (money /
    * quantity columns); Σ fits decimal(35,4) up to ~10^31.
    */
  def corrBattery(df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val xd = col(xCol).cast("decimal(12,2)")
    val yd = col(yCol).cast("decimal(12,2)")
    // pairwise-complete: n must count exactly the rows the sums aggregate,
    // or every derived moment is computed against the wrong denominator
    val sums = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(xd).cast("double").as("sx"),
      sum(yd).cast("double").as("sy"),
      sum(xd * xd).cast("double").as("sxx"),
      sum(xd * yd).cast("double").as("sxy"),
      sum(yd * yd).cast("double").as("syy"))
    val n = col("n").cast("double")
    val cov = n * col("sxy") - col("sx") * col("sy")
    val varx = n * col("sxx") - col("sx") * col("sx")
    val vary = n * col("syy") - col("sy") * col("sy")
    val slope = cov / varx
    sums.select(
      col(groupCol), col("n"),
      (cov / (sqrt(varx) * sqrt(vary))).as("corr"),
      slope.as("slope"),
      ((col("sy") - slope * col("sx")) / n).as("intercept"),
      ((col("sxy") - col("sx") * col("sy") / n) / n).as("covar_pop"))
  }

  /** Key-skew diagnostic for a prospective shuffle key: the per-key row
    * count distribution summarized to one row — key cardinality, total
    * rows, the heaviest key's count, exact p50/p90/p99 of the count
    * distribution, and `skew_ratio` = max/mean (the factor by which the
    * hottest reducer outruns the average one; ≳ 5–10 is the regime where
    * `SkewOps.saltedAggregate`/AQE skew handling start paying).
    *
    * This is the measurement step that should precede any salting decision
    * at 100 TB — salt factors are guesses without it. Cost: one map-side
    * combinable count per key, then a single-row reduce; the exact
    * percentiles hold the n_keys counts in one aggregation state, which is
    * fine up to ~10⁸ distinct keys — beyond that swap `percentile` for
    * `approx_percentile` (the ratio columns stay exact either way).
    */
  def skewReport(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("cnt"))
    counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("total_rows"),
      max(col("cnt")).as("max_cnt"),
      expr("percentile(cnt, 0.5)").as("p50"),
      expr("percentile(cnt, 0.9)").as("p90"),
      expr("percentile(cnt, 0.99)").as("p99"))
      .withColumn("skew_ratio",
        col("max_cnt").cast("double") /
          (col("total_rows").cast("double") / col("n_keys").cast("double")))
  }

  /** One-pass column profile: for each named column, a row with the table
    * row count, null count, exact distinct count, numeric min/max (double,
    * NULL for non-numeric types), and mean string length (NULL for
    * non-strings). The shape every ingestion gate wants first — is this
    * column dense, is its domain sane, did the feed's cardinality jump.
    *
    * Plan shape: ONE aggregation over one scan computes every statistic for
    * every column (the per-column rows are unstacked from the single
    * result row afterwards — a union of per-column aggregates would rescan
    * the table once per column). The n exact `countDistinct`s share that
    * aggregation through Catalyst's Expand rewrite, which multiplies the
    * shuffled rows ×(n+1) — linear in column count, and each expanded row
    * carries one column, so bytes shuffled stay ≈ table width. At 100 TB
    * with wide tables, swap `countDistinct` for `approx_count_distinct`
    * (HLL, no Expand) and drop the oracle to rows-only — the other columns
    * are plain map-side-combinable aggregates either way.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    require(cols.distinct.size == cols.size, "duplicate columns in profile list")
    import org.apache.spark.sql.types.{ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType, StringType}
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val numeric: Set[org.apache.spark.sql.types.DataType] =
      Set(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
    def nullD = lit(null).cast("double")
    val aggs = cols.flatMap { c =>
      val t = types.getOrElse(c, sys.error(s"profile: no column '$c' in ${df.columns.mkString(",")}"))
      Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        (if (numeric(t)) min(col(c)).cast("double") else nullD).as(s"__mn_$c"),
        (if (numeric(t)) max(col(c)).cast("double") else nullD).as(s"__mx_$c"),
        (if (t == StringType)
           sum(length(col(c)).cast("long")).cast("double") / count(col(c)).cast("double")
         else nullD).as(s"__al_$c"))
    } :+ count(lit(1)).as("__n_rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'${c.replace("'", "''")}', __n_rows - `__nn_$c`, `__nd_$c`, `__mn_$c`, `__mx_$c`, `__al_$c`"
    }.mkString(", ")
    one.select(
      expr(s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_d, max_d, avg_len)"),
      col("__n_rows").as("n_rows"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"), col("n_distinct"),
        col("min_d"), col("max_d"), col("avg_len"))
  }

  /** Exact functional-dependency discovery over a column set: for every
    * ordered pair (a, b), a ≠ b, report whether a → b holds — i.e. no value
    * of `a` maps to two distinct non-null values of `b`. The profiling
    * primitive behind candidate-key detection, denormalization checks, and
    * "did this feed break the city→country invariant" data-quality gates.
    *
    * `max_branch` is the largest per-a-value distinct-b count (1 means the
    * dependency holds exactly; 2+ counts its violations' width), `n_groups`
    * the determinant's cardinality. NULL b values are ignored on both
    * engines (`countDistinct` / `COUNT(DISTINCT)` skip nulls), so an
    * all-null dependent column reads max_branch 0 and trivially holds.
    *
    * Plan shape: one groupBy per DETERMINANT (not per pair) — each computes
    * the distinct-b widths for all other columns in a single aggregation,
    * so n columns cost n shuffles instead of n². Within each, the multi
    * `countDistinct` rides Catalyst's Expand (input ×(n-1), one column per
    * expanded row). The 100 TB alternative when Expand's row blowup bites:
    * per-pair two-level aggregation (groupBy(a,b) → groupBy(a) count, then
    * max) shuffles only the distinct pairs — switch per-determinant when a
    * profile (above) shows high pair cardinality.
    */
  def functionalDeps(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    require(cols.distinct.size == cols.size, "duplicate columns")
    val perDet = cols.map { a =>
      val deps = cols.filterNot(_ == a)
      val cds = deps.map(b => countDistinct(col(b)).as(s"__cd_$b"))
      val grouped = df.groupBy(col(a)).agg(cds.head, cds.tail: _*)
      val tops = deps.map(b => max(col(s"__cd_$b")).as(s"__mx_$b")) :+
        count(lit(1)).as("__n_groups")
      val one = grouped.agg(tops.head, tops.tail: _*)
      val stackArgs = deps.map(b =>
        s"'${b.replace("'", "''")}', `__mx_$b`").mkString(", ")
      one.select(
        lit(a).as("determinant"),
        expr(s"stack(${deps.size}, $stackArgs) AS (dependent, max_branch)"),
        col("__n_groups").as("n_groups"))
    }
    perDet.reduce(_ unionByName _)
      .select(col("determinant"), col("dependent"), col("n_groups"),
        col("max_branch"),
        (col("max_branch") <= 1).cast("int").as("holds"))
  }
}
