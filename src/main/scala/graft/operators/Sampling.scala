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
}
