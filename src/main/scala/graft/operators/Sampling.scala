package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and splitting for training-data pipelines.
  *
  * Everything keys off an arithmetic hash of a stable id — never `rand()` —
  * so assignments are reproducible run-to-run, engine-to-engine, and under
  * retries/speculative execution (a re-run task must land every row in the
  * same split, or downstream trainers see leakage between train and test).
  */
object Sampling {

  /** Bucket 0..99 from a numeric key: Knuth multiplicative hash over the
    * key reduced mod 1000003 first — every intermediate stays < 2^51, so
    * the arithmetic is portable to engines that RAISE on 64-bit overflow
    * (DuckDB) as well as those that wrap (JVM). The product is shifted
    * right 13 bits before the final mod so the bucket reads the hash's
    * MIXED high bits — a bare `product % 100` only sees `key % 100` through
    * a fixed permutation, which skews splits for stride-100 / even-only id
    * schemes. Keys are assumed nonnegative (the shift is arithmetic and the
    * DuckDB mirror `(((k % 1000003) * 2654435761) // 8192) % 100` uses
    * C-style `%`; both agree with this column only for k >= 0).
    */
  def hashBucket(key: Column): Column =
    pmod(shiftright((key.cast("long") % 1000003L) * 2654435761L, 13), lit(100L))

  /** Split assignment column from cumulative percentage thresholds, e.g.
    * `Seq("train" -> 80, "val" -> 10, "test" -> 10)`. Percentages must sum
    * to 100; every row lands in exactly one split.
    */
  def splitColumn(key: Column, splits: Seq[(String, Int)]): Column = {
    require(splits.map(_._2).sum == 100, "split percentages must sum to 100")
    val b = hashBucket(key)
    val cum = splits.scanLeft(0)(_ + _._2).tail
    splits.zip(cum).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), upper)) =>
        Some(acc.fold(when(b < upper, name))(_.when(b < upper, name)))
    }.get.otherwise(splits.last._1)
  }

  /** Uniform deterministic sample: keep rows whose key-bucket < pct. */
  def hashSample(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(keyCol)) < pct)

  /** Stratified deterministic sample: per-stratum keep-percentages (strata
    * absent from the map fall back to `defaultPct`). The rate is exact in
    * expectation per stratum because the hash is uniform over keys within
    * each stratum — no shuffle, no state, pure map-side filter.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
                       pctByStratum: Map[String, Int], defaultPct: Int): DataFrame = {
    val pct = pctByStratum.foldLeft(Option.empty[Column]) {
      case (acc, (stratum, p)) =>
        Some(acc.fold(when(col(strataCol) === stratum, p))(_.when(col(strataCol) === stratum, p)))
    }.fold(lit(defaultPct))(_.otherwise(defaultPct))
    df.filter(hashBucket(col(keyCol)) < pct)
  }

  /** Weighted corpus mix: deterministically down-sample each source to its
    * percentage and union them with a provenance tag. The standard
    * pre-training recipe step (N corpora, each with a mixing weight),
    * expressed as map-side filters + union — no shuffle.
    */
  def weightedMix(sources: Seq[(String, DataFrame, Int)], keyCol: String): DataFrame =
    sources.map { case (tag, df, pct) =>
      hashSample(df, keyCol, pct).withColumn("mix_source", lit(tag))
    }.reduce(_ unionByName _)

  /** Deterministic fractional up/down-sampling — the "epochs" knob of a
    * pre-training data recipe (a source seen 2.5 epochs appears 2–3 times;
    * one seen 0.3 epochs appears 0–1 times). `rateMilli` is the epoch rate
    * × 1000 kept integral so both engines compute identical copy counts:
    * every row gets `rateMilli div 1000` whole copies plus one more iff its
    * key-bucket (0..999) falls under the fractional part — so per-key copy
    * counts are reproducible under retries, and the corpus-level expansion
    * is exact-in-expectation with the error of a single row. Rows with
    * zero copies drop; survivors explode to (row, copy_id 1..n_copies),
    * copy_id being what downstream shuffling/packing needs to keep repeated
    * documents from landing adjacently. Map-side generate, no shuffle.
    */
  def epochMix(df: DataFrame, keyCol: String, rateMilli: Long): DataFrame = {
    require(rateMilli >= 0, s"rateMilli must be >= 0, got $rateMilli")
    // withColumn REPLACES same-named input columns silently — a frame
    // already carrying either output name would be corrupted with no
    // diagnostic (ADVICE r16); fail early like the other operators
    Seq("n_copies", "copy_id").foreach(c =>
      require(!df.columns.contains(c),
        s"epochMix writes column '$c'; the input already has one — rename it first"))
    val copies = lit(rateMilli / 1000) +
      when(hashBucketFine(col(keyCol), 1000L) < rateMilli % 1000, 1L).otherwise(0L)
    df.withColumn("n_copies", copies)
      .filter(col("n_copies") > 0)
      .withColumn("copy_id", explode(sequence(lit(1L), col("n_copies"))))
  }

  /** Fine-grained deterministic bucket 0..buckets-1 — [[hashBucket]]'s hash
    * with a caller-chosen modulus, for keep-rates that need more resolution
    * than percent (temperature sampling thresholds land anywhere in
    * [0, 10^6]). Same portable-arithmetic envelope: intermediates < 2^51.
    * The mod-1000003 key reduction caps distinct hash inputs at ~10^6 — at
    * corpus scale swap the reduction for xxhash64 if more than ~10^6
    * distinct keys must bucket independently; the CONTRACT (threshold
    * compare against a uniform deterministic bucket) is unchanged.
    */
  def hashBucketFine(key: Column, buckets: Long): Column = {
    require(buckets > 0 && buckets <= 1000003L, s"buckets must be in [1, 1000003], got $buckets")
    pmod(shiftright((key.cast("long") % 1000003L) * 2654435761L, 13), lit(buckets))
  }

  /** Exact integer square root as a column expression: `floor(sqrt(x))` for
    * `0 <= x < 2^52`. Double sqrt is correctly rounded (IEEE), so after
    * floor the candidate is off by at most one — the two integer-compare
    * corrections make the result EXACT on both engines regardless of how
    * the float value rounded, which is what lets sqrt-based sampling rates
    * be hash-pinned (a raw `floor(sqrt(...))` can disagree across engines
    * exactly at perfect squares). The same three-step form is generated
    * into the oracle SQL.
    */
  def isqrt(x: Column): Column = {
    val s0 = floor(sqrt(x.cast("double"))).cast("long")
    val down = s0 - when(s0 * s0 > x, 1L).otherwise(0L)
    down + when((down + 1L) * (down + 1L) <= x, 1L).otherwise(0L)
  }

  /** Temperature-balanced multilingual sampling at τ = 2 (UniMax / mT5
    * style): resample a corpus whose natural language distribution is
    * ∝ n_l toward q_l ∝ n_l^(1/τ) = sqrt(n_l), by keeping each document of
    * language l with rate r_l = sqrt(n_min / n_l) — the smallest language
    * is kept WHOLE and every larger one is down-sampled by the square root
    * of its size advantage, flattening the head without starving it. τ = 2
    * specifically because sqrt is exactly computable in integers on both
    * engines ([[isqrt]]); other powers of two nest it (τ = 4 = isqrt∘isqrt).
    *
    * Mechanics: per-language counts (one partial-aggregated shuffle of the
    * corpus — at 100 TB this is the metadata-sized aggregate), a global min
    * over the ≤|langs|-row counts relation (unpartitioned window over the
    * tiny aggregate, never over data), integer thresholds
    * `isqrt(BucketSpace² · n_min div n_l)` joined back broadcast, and a
    * map-side `hashBucketFine(key) < threshold` filter. Fully deterministic
    * — retries and engines agree row-for-row. Output keeps the input
    * columns plus `mix_n` (language count) and `mix_thr` (the threshold in
    * bucket space, i.e. the keep-rate × 10^6).
    */
  val TemperatureBucketSpace: Long = 1000000L
  def temperatureMix(df: DataFrame, langCol: String, keyCol: String): DataFrame =
    temperatureMixFromCounts(df,
      df.groupBy(col(langCol)).agg(count(lit(1)).as("mix_n")), langCol, keyCol)

  /** Integer keep-thresholds from a per-language counts relation
    * (`langCol`, `mix_n`) — the τ=2 arithmetic factored out of
    * [[temperatureMix]] so the counts can come from ANYWHERE: the batch
    * groupBy, or a MAINTAINED state table (AggDelta keeps (lang, cnt)
    * current at cost ∝ batch — the streaming-ingest shape, where
    * re-counting the corpus per batch would be ∝ corpus). The relation is
    * ≤|langs| rows; the min window and isqrt run over metadata, never data.
    */
  def temperatureThresholds(counts: DataFrame, langCol: String = "lang"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // BucketSpace²·n_min stays in 64 bits for n_min ≤ 9.2·10^6; beyond that
    // (a 100 TB corpus whose SMALLEST language tops 9M docs) right-shift
    // both counts by a common k first — thresholds move < 1 bucket. div
    // (integral divide), NOT `/`: Spark's `/` on longs is double division,
    // which loses exactness past 2^53 and would un-pin the hash.
    counts
      .withColumn("__nmin", min(col("mix_n")).over(w))
      .withColumn("mix_thr",
        isqrt(call_function("div",
          lit(TemperatureBucketSpace * TemperatureBucketSpace) * col("__nmin"),
          col("mix_n"))))
      .drop("__nmin")
  }

  /** [[temperatureMix]] against externally-supplied counts: thresholds from
    * [[temperatureThresholds]], broadcast-joined, then the map-side
    * deterministic bucket filter. With maintained counts this is the
    * incremental form — identical output to the batch recompute whenever
    * the counts relation equals the corpus's true per-language counts (the
    * q_temperature_maintain gate).
    */
  def temperatureMixFromCounts(df: DataFrame, counts: DataFrame,
                               langCol: String, keyCol: String): DataFrame =
    // Thresholds pinned (localCheckpoint, ≤|langs| rows — metadata): the
    // bucket filter references mix_thr, and CollapseProject + filter
    // substitution would otherwise inline the whole isqrt tree into the
    // per-DOCUMENT filter — threshold arithmetic recomputed per corpus row
    // instead of once per language (the r16 filter-pushdown blowup law,
    // caught by PlanLint on this operator's plan).
    df.join(broadcast(temperatureThresholds(counts, langCol).localCheckpoint()),
        Seq(langCol))
      .filter(hashBucketFine(col(keyCol), TemperatureBucketSpace) < col("mix_thr"))
}
