package graft.examples

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposes the SemDeDup nlist ladder's right side (r12 verdict Next #2):
  * which stage actually pays ∝ nlist — Lloyd training, the assignment pass,
  * or the post-assignment mining/CC/keep-rule — and what the pruned exact
  * assignment buys over the brute scan on THIS corpus (near-uniform random
  * directions are the pruner's worst case: chord distances concentrate at
  * √2 in 64 dims, so triangle-inequality bounds may admit everything).
  *
  * `runMain graft.examples.SemAssignProbe <corpusDir> <nlist[,nlist...]>`
  * where corpusDir is a parquet dir with (vec_id, embedding) — e.g. the
  * /tmp/graft-semknob-<f>x dir a SemKnobProbe run leaves behind.
  */
object SemAssignProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SemAssignProbe <corpusDir> <nlist,...>")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // `gen:<n>:<hubs>:<dim>` synthesizes a CLUSTERED corpus (vectors = unit
    // hub direction + 0.1-σ noise, deterministic per id) — embedding corpora
    // that k-means serves well are clustered, and clustering is exactly the
    // structure triangle-inequality pruning converts into skipped work; the
    // parquet mode's ScaleUp corpus is the opposite extreme (near-uniform
    // directions, chord distances concentrated at √2, nothing prunable).
    // optional 4th gen field `:<super>`: hubs are drawn AROUND `super`
    // random super-directions (0.15-σ) instead of independently — the
    // hierarchical regime where trained centroids are themselves clustered
    // and the triangle-inequality gate engages.
    val corpus = (if (args(0).startsWith("gen:")) {
      val parts = args(0).split(":")
      val (n0, hubs, dim) = (parts(1).toLong, parts(2).toInt, parts(3).toInt)
      val nSuper = parts.lift(4).map(_.toInt).getOrElse(0)
      spark.range(n0).select(col("id").as("vec_id"),
        udf((id: Long) => {
          val hub = (id % hubs).toInt
          val rh = new scala.util.Random(hub * 7919L + 13)
          // noise budgets are TOTAL-norm relative (σ/√dim per component):
          // per-component σ of 0.15 in 64 dims is a perturbation of norm
          // ~1.2 against a UNIT direction — no structure survives it
          val dir = if (nSuper <= 0) Array.fill(dim)(rh.nextGaussian())
            else {
              val rs = new scala.util.Random((hub % nSuper) * 15485863L + 29)
              val sup = Array.fill(dim)(rs.nextGaussian())
              val sn = math.sqrt(sup.map(x => x * x).sum)
              val s = 0.15 / math.sqrt(dim.toDouble)
              sup.map(x => x / sn + s * rh.nextGaussian())
            }
          val nm = math.sqrt(dir.map(x => x * x).sum)
          val rv = new scala.util.Random(id * 104729L + 7)
          val sv = 0.3 / math.sqrt(dim.toDouble)
          dir.map(x => (x / nm + sv * rv.nextGaussian()).toFloat).toSeq
        }).apply(col("vec_id")).as("embedding"))
    } else spark.read.parquet(args(0))).localCheckpoint()
    val n = corpus.count()
    println(s"PROBE corpus n=$n (${args(0)})")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (k <- args(1).split(",").map(_.trim.toInt)) {
      var cs: Seq[Array[Float]] = null
      val tTrain = timed { cs = Similarity.trainCentroids(corpus, "vec_id", "embedding", k, iters = 3) }
      val pruner = Similarity.CentroidPruner(cs)
      val bc = spark.sparkContext.broadcast(pruner)
      val base = corpus.select(col("embedding")).as[Seq[Float]]
      val tPruned = timed(base.map(v => bc.value.assign(v)).groupBy("value").count().count())
      val tBrute = timed(base.map(v => bc.value.assignBrute(v)).groupBy("value").count().count())
      val tRest = timed(
        Similarity.semDedup(corpus, "vec_id", "embedding", nlist = k, tau = 0.9,
          centroids = Some(cs)).count())
      println(f"PROBE nlist=$k%-5d train=$tTrain%7.2f s  assign_pruned=$tPruned%6.2f s  " +
        f"assign_brute=$tBrute%6.2f s  dedup_from_centroids=$tRest%7.2f s  " +
        s"grouped=${pruner.grouped}")
      bc.destroy()
    }
    spark.stop()
  }
}
