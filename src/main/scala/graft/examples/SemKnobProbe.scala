package graft.examples
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the SemDeDup `nlist` knob where C(cell, 2) dominates — the one
  * scale claim the r11 slope table carried without a number behind it
  * (SCALING.md: "the knob starts paying at ~10⁵ vectors/cell", extrapolated
  * from a cost-neutral 16→64 A/B over 20k vectors).
  *
  * `runMain graft.examples.SemKnobProbe <srcSfDir> <factor> <nlist,nlist,…>`
  * replicates `embeddings.parquet` ×factor with [[ScaleUp]]'s per-replica
  * ±1 sign-pattern construction (orthogonal transform — intra-replica
  * geometry exact, cross-replica cosine ~0, so no phantom near-dup mass),
  * writes the scaled corpus ONCE to /tmp (so every ladder rung reads the
  * same on-disk input, not a 100-leg union plan), then times
  * `semDedup(nlist = k, tau = 0.9)` for each requested k.
  *
  * In-cell candidate-pair mass is Σ_cells C(n_cell, 2) ≈ N²/(2·nlist) for
  * balanced cells: at N = 200k, nlist 16 carries ~1.25G pairs, 64 ~312M,
  * 256 ~78M — the regime where raising nlist MUST pay, if the quadratic
  * term is real and Lloyd training (one extra pass per iteration, cost
  * ∝ N·nlist·dim) doesn't eat the saving. Dev-side instrument only.
  */
object SemKnobProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: SemKnobProbe <srcSfDir> <factor> <nlist,nlist,...>")
    val (src, factor) = (args(0), args(1).toInt)
    val nlists = args(2).split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val span = emb.agg(max("vec_id")).head().getLong(0) + 1L
    val big = (0 until factor).map { i =>
      val leg = emb.withColumn("vec_id", col("vec_id") + lit(i * span))
      if (i == 0) leg
      else leg.withColumn("embedding", transform(col("embedding"), (x, dim) =>
        when(pmod(dim * lit(2654435761L) + lit(i.toLong * 40503L), lit(97L)) < 48, x)
          .otherwise(-x)))
    }.reduce(_ unionByName _)
    val dir = s"/tmp/graft-semknob-${factor}x"
    big.write.mode("overwrite").parquet(dir)
    val corpus = spark.read.parquet(dir)
    val n = corpus.count()
    println(s"PROBE corpus n=$n (${factor}x of $src)")

    for (k <- nlists) {
      val t0 = System.nanoTime()
      val kept = Similarity.semDedup(corpus, "vec_id", "embedding", nlist = k, tau = 0.9).count()
      val secs = (System.nanoTime() - t0) / 1e9
      val pairs = n.toDouble * n / (2 * k) // balanced-cell estimate
      println(f"PROBE semDedup nlist=$k%-5d kept=$kept%8d  $secs%8.2f s  (~${pairs / 1e6}%.0fM est in-cell pairs)")
    }
    spark.stop()
  }
}
