package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Arithmetic contract: element products stay in float32 (the storage type),
  * accumulation is sequential in float64 — reproducible across engines and
  * partitionings because the per-row fold order is the array order.
  *
  * Scale paths:
  *  - [[cosineTopK]] — brute force; right for a small broadcast query set
  *    (cost |queries| × n, embarrassingly parallel, no shuffle of the corpus).
  *  - [[lshTopK]] — random-hyperplane LSH: corpus hashed once into sign
  *    buckets, queries probe only their bucket(s); recall traded for a
  *    candidate set ~n/2^bits per table.
  *  - an IVF variant would k-means the corpus into nlist cells and probe
  *    nprobe cells; the bucketing/probing skeleton is the same as LSH with
  *    centroid-assignment replacing sign hashes.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Exact top-k cosine neighbors for each query row. `queries` is expected
    * to be small (it is broadcast); the corpus streams map-side — no corpus
    * shuffle. Ranking ties break on neighbor id for determinism.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** All pairs with cosine ≥ tau — exact, via block-nested join. Quadratic:
    * use only for modest corpora or post-LSH verification; the LSH route is
    * [[lshTopK]]'s bucketing with a verify filter (see Dedup.minhashDedup
    * for the identical candidates→verify shape).
    */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String, tau: Double): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("__va"), col("__vb")))
      .filter(col("sim") >= tau)
      .select("id_a", "id_b", "sim")
  }

  /** Deterministic pseudo-random hyperplane component for (table, bit, dim):
    * Spark's Murmur3 `hash` folded to [-1, 1] — well-mixed (a hand-rolled
    * linear congruence here correlates the bits and craters recall),
    * reproducible run-to-run, and codegen'd.
    */
  private def planeCoef(table: Int, bit: Int, dim: Column): Column =
    (pmod(hash(lit(table), lit(bit), dim), lit(1000003)).cast("double") / 1000003.0) * 2.0 - 1.0

  /** Random-hyperplane LSH signature: `bits` sign bits per table. */
  def signBits(vec: Column, table: Int, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, bitIdx) =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeCoef(table, bitIdx, i)),
        lit(0.0), (s, v) => s + v)
      acc + when(proj > 0, lit(1L << bitIdx)).otherwise(lit(0L))
    }

  /** Approximate top-k: hash corpus + queries into sign buckets across
    * `tables` tables, take bucket-colliding candidates, rank exactly. The
    * corpus shuffle is on (table, bucket) — bounded fan-out per row =
    * `tables`; queries are broadcast. Recall rises with tables.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, bits: Int = 12, tables: Int = 4): DataFrame = {
    def bucketed(df: DataFrame, id: String, vec: String, pfx: String) =
      df.select((col(idCol).as(id) +: col(vecCol).as(vec) +:
        (0 until tables).map(t => signBits(col(vecCol), t, bits).as(s"b$t"))): _*)
        .select(col(id), col(vec), posexplode(
          array((0 until tables).map(t => col(s"b$t")): _*)).as(Seq(s"${pfx}_tbl", s"${pfx}_bucket")))
    val c = bucketed(corpus, "neighbor_id", "__cv", "c")
    val q = broadcast(bucketed(queries, "query_id", "__qv", "q"))
    val cands = c.join(q,
        col("c_tbl") === col("q_tbl") && col("c_bucket") === col("q_bucket") &&
          col("neighbor_id") =!= col("query_id"))
      .select("query_id", "__qv", "neighbor_id", "__cv").distinct()
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    cands.withColumn("sim", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }
}
