package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication for large corpora: exact, n-gram Jaccard (inverted index),
  * MinHash+LSH, SimHash.
  *
  * Scale design: nothing here cross-joins. Exact dedup is one hash
  * aggregation; Jaccard and MinHash candidate generation go through
  * explode → shuffle-on-token/bucket → self-equi-join, so cost follows the
  * number of COLLIDING pairs, not n². At 100 TB the LSH path is the default
  * and the exact-Jaccard verify runs only on the candidate set.
  */
object Dedup {

  /** Exact dedup: keep the first (smallest `keepBy`) row per key set. One
    * shuffle on the key columns; map-side partial min keeps it light.
    */
  def exact(df: DataFrame, keys: Seq[String], keepBy: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(keepBy).asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Distinct shingles exploded to (id, shingle) rows via a typed flatMap
    * with pure-Scala tokenization. Deliberately NOT the Catalyst HOF chain:
    * interpreted `transform`/`concat_ws` lambdas cost ~7 ms per 40-token doc
    * (measured at sf0.1); this plain-Scala path is ~80× faster and fully
    * distributed. Semantics mirror [[TextOps.tokens]]/[[TextOps.shingles]]
    * exactly for ASCII text (same regexes, same first-occurrence distinct) —
    * pinned by the DuckDB oracle on q_jaccard_pairs/q_minhash_bands.
    */
  def explodedShingles(df: DataFrame, idCol: String,
                       textCol: String, n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Ids must be long-castable (the data model's numeric doc ids); null or
    // non-castable ids are dropped here rather than crashing the primitive
    // encoder — they could never round-trip through the dedup joins anyway.
    df.select(col(idCol).cast("long").as("id"), col(textCol).cast("string").as("t"))
      .filter(col("id").isNotNull)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        shingleSet(if (text == null) "" else text, n).map((id, _))
      }
      .toDF("id", "s")
  }

  /** Pure-Scala twin of normText→tokens→shingles (ASCII-faithful). */
  private[operators] def shingleSet(text: String, n: Int): Seq[String] = {
    val toks = text.toLowerCase
      .replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim
      .split(" ", -1)
    if (toks.length < n) Seq.empty
    else (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" ")).distinct
  }

  /** Exact pairwise n-gram Jaccard ≥ `tau` via an inverted shingle index:
    * explode distinct shingles → self-join on shingle (id < id) → count
    * common shingles per pair → Jaccard from the set sizes. Never builds the
    * n² cross product; the join fans out only where shingles collide. Skewed
    * ultra-common shingles would hot-spot the join at scale — mitigate by
    * dropping shingles with document frequency above a cap (they can only
    * connect near-identical boilerplate anyway).
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int, tau: Double,
                   persistIntermediate: Boolean = true): DataFrame = {
    // the shingle relation feeds three branches (sizes + both self-join
    // sides); persist it so the source is scanned once
    val ex0 = explodedShingles(df, idCol, textCol, n)
    val ex = if (persistIntermediate)
      ex0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else ex0
    jaccardFromShingles(ex, tau)
  }

  /** Jaccard ≥ tau over an exploded (id, s) shingle relation; `restrictTo`
    * limits the self-join to the given (id_a, id_b) candidate pairs — the
    * LSH-verify path.
    */
  private def jaccardFromShingles(ex: DataFrame, tau: Double,
                                  restrictTo: Option[DataFrame] = None): DataFrame = {
    val sizes = ex.groupBy("id").agg(count(lit(1)).as("n_sh")) // shingles are distinct
    val exJoin = restrictTo match {
      case Some(cands) =>
        val candIds = cands.select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
        ex.join(broadcast(candIds), "id")
      case None => ex
    }
    val inter = exJoin.as("a").join(exJoin.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    val pairs = restrictTo match {
      case Some(cands) => cands.join(inter, Seq("id_a", "id_b"))
      case None        => inter
    }
    pairs
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= tau)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash parameters: `numHashes` permutations h_i(x) = (a_i·x + b_i) mod
    * P over the shingles' polynomial hashes, banded `bands` × `rowsPerBand`
    * for LSH. Constants are fixed so signatures are reproducible run-to-run
    * and engine-to-engine.
    */
  val MinHashP = 2147483647L // 2^31 - 1
  def aCoef(i: Int): Long = 2L * i + 1
  def bCoef(i: Int): Long = 7919L * i + 13

  /** Minhash signature columns `mh0..mh{k-1}` attached to `df`, computed in
    * the exploded formulation: (id, shingle) rows → one polyhash per shingle
    * → groupBy(id) with `numHashes` codegen'd MIN aggregates. One shuffle on
    * id, map-side partial mins, no nested-array recomputation (the naive
    * per-row `array_min(transform(...))` per hash re-evaluates the shingle
    * hash array once per permutation after projection collapse). Documents
    * with no shingles get NULL minhashes via the left join.
    */
  def withMinHashes(df: DataFrame, idCol: String, textCol: String,
                    n: Int, numHashes: Int): DataFrame = {
    val sig = minhashSignatures(explodedShingles(df, idCol, textCol, n), numHashes)
    df.join(sig, df(idCol).cast("long") === sig("id"), "left_outer").drop(sig("id"))
  }

  /** (id, mh0..mh{k-1}) from an exploded shingle relation. */
  private def minhashSignatures(ex: DataFrame, numHashes: Int): DataFrame = {
    val hashed = ex.select(col("id"), TextOps.polyHash(col("s")).as("h"))
    val aggs = (0 until numHashes).map(i =>
      min((lit(aCoef(i)) * col("h") + lit(bCoef(i))) % MinHashP).as(s"mh$i"))
    hashed.groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** Collapse minhash columns into `bands` band-hash columns `band0..`. */
  def withBands(df: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    (0 until bands).foldLeft(df) { (d, j) =>
      val bandHash = (0 until rowsPerBand).foldLeft(lit(0L)) { (acc, k) =>
        (acc * 31 + col(s"mh${j * rowsPerBand + k}")) % MinHashP
      }
      d.withColumn(s"band$j", bandHash)
    }

  /** LSH candidate pairs: docs sharing at least one band hash. Explode the
    * band columns → shuffle on (band index, band value) → self-join within
    * buckets → distinct pairs. Cost ∝ bucket collision mass, not n².
    */
  def lshCandidates(df: DataFrame, idCol: String, textCol: String,
                    n: Int = 3, numHashes: Int = 32,
                    bands: Int = 8, rowsPerBand: Int = 4,
                    shingles: Option[DataFrame] = None): DataFrame = {
    val sig = withBands(minhashSignatures(
      shingles.getOrElse(explodedShingles(df, idCol, textCol, n)), numHashes),
      bands, rowsPerBand)
    val buckets = sig.select(col("id"), posexplode(
      array((0 until bands).map(j => col(s"band$j")): _*)).as(Seq("band_idx", "band_val")))
      .filter(col("band_val").isNotNull)
    buckets.as("a").join(buckets.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** MinHash-LSH near-dedup: candidates from LSH, verified with exact n-gram
    * Jaccard, then drop every doc that has a verified near-dup with a
    * smaller id (deterministic survivor rule). Returns the kept rows.
    */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, tau: Double = 0.5,
                   persistIntermediate: Boolean = true): DataFrame = {
    // One shingle pass shared by signature, candidate, and verify stages —
    // re-deriving the shingles from the source in every self-join branch
    // costs 16 table scans in the naive plan; ruinous when the source is a
    // 100 TB table. Persisting the (id, shingle) relation makes it one scan
    // + cached reuse; Spark evicts MEMORY_AND_DISK blocks under pressure.
    val ex0 = explodedShingles(df, idCol, textCol, n)
    val ex = if (persistIntermediate)
      ex0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else ex0
    val cands = lshCandidates(df, idCol, textCol, n, shingles = Some(ex))
    // Exact-verify ONLY the candidate pairs, via the inverted index
    // restricted to candidate docs.
    val verified = jaccardFromShingles(ex, tau, restrictTo = Some(cands))
    val drop = verified.select(col("id_b").as("__drop_id")).distinct()
    df.join(drop, df(idCol).cast("long") === col("__drop_id"), "left_anti")
  }

  /** SimHash near-dup buckets: documents sharing the same 30-bit simhash.
    * For hamming-distance-k matching at scale, band the bits (k+1 tables)
    * like minhash bands — exposed here as the exact-collision base case.
    */
  def simhashGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextOps.simHash(TextOps.tokens(col(textCol))).as("simhash"))
}
