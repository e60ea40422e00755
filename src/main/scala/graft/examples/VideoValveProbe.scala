package graft.examples

import graft.operators.{Multimodal, Sampling}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures q_video_neardup's output-contract valves (r12 verdict Next #4):
  * after the signature-collapse rejection, the named 100 TB levers are a
  * tighter `maxHamming`, a higher `minMatchFrac`, and frame-position
  * sampling (`frameStride`) — none of which had a recall/cost curve the way
  * banding's 8×4-vs-16×2 does. This sweeps them on the same corpus
  * construction the query and VideoSlopeProbe use (docs + exact clone at
  * +100000 + " xyzzy"-suffixed near-clone at +200000), against the planted
  * ground truth:
  *
  *   - trio_v01 = base↔exact-clone pairs: identical frames, must be found
  *     by EVERY config (recall floor — a config that drops one is broken,
  *     not tight);
  *   - trio_near = pairs involving the xyzzy variant: the tail frames
  *     differ, so these trace the knobs' real recall trade;
  *   - xrep / xdoc = ScaleUp replica leakage / intrinsic template-text
  *     similarity — the mass the valves exist to shrink.
  *
  * minMatchFrac needs no re-join: it is the operator's LAST filter, so each
  * (maxHamming, stride) run mines once at frac 0 and the curve derives by
  * post-filtering the checkpointed result — exactly the operator's own
  * semantics. `runMain graft.examples.VideoValveProbe <sfDir> [docSpan]`.
  */
object VideoValveProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val span = args.lift(1).map(_.toLong).getOrElse(5000L)
    // optional 3rd arg: text replication factor — ×20 turns the 3–13-frame
    // corpus into a 60–260-frame one, the LONG-video regime where the r13
    // sweep's conclusion predicts stride is pure join-cost win (the sampled
    // denominator stays fine-grained, so nothing inflates)
    val xtext = args.lift(2).map(_.toInt).getOrElse(1)
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val docs0 = spark.read.parquet(s"$d/documents.parquet")
      .filter(Sampling.hashBucket(col("doc_id")) < 15)
    val docs = if (xtext <= 1) docs0
      else docs0.withColumn("text",
        concat_ws(" ", (0 until xtext).map(i =>
          concat(col("text"), lit(s" seg$i"))): _*))
    val vids = docs.select(col("doc_id"), col("text"))
      .union(docs.select((col("doc_id") + 100000).as("doc_id"), col("text")))
      .union(docs.select((col("doc_id") + 200000).as("doc_id"),
        concat(col("text"), lit(" xyzzy")).as("text")))
    val media = Multimodal.asAviMediaTable(spark, vids, "doc_id", "text",
      blocksPerRow = 10, frameBytes = 48).localCheckpoint()
    val nbases = docs.count()
    println(s"PROBE bases=$nbases videos=${media.count()}")
    val (_, tDecode) = timed(Multimodal.videoFrameDHash(spark, media).count())
    println(f"PROBE decode+dhash $tDecode%7.2f s (paid once per corpus pass, valve-independent)")

    // ---- MIXED-corpus tier-boundary sweep (r13 verdict Next #4) ----------
    // `xtext = 0` switches to a GRADED corpus — per-doc replication factor
    // xf ∈ {1,7,13,19} by doc_id%4, spreading video lengths across
    // ~3–13 / 21–91 / 39–169 / 57–247 frames — and sweeps
    // videoNearDupPairsTiered's tierMinFrames at the production stride 2.
    // The r13 sweep measured each tier half's behavior on a PURE corpus;
    // is the first measurement of what the boundary actually adjudicates:
    // a pair population containing shorts, longs, and cross-tier pairs at
    // once. Planted truth as above (v01 = exact-clone recall floor); junk =
    // xrep+xdoc at frac ≥ 0.8 — the quantization-inflated mass a too-low
    // boundary readmits by letting small-denominator pairs ride the strided
    // branch. Endpoints: tierMin=1 ≈ plain stride-2 everywhere (max junk,
    // min wall), tierMin=256 ≈ full resolution everywhere (stride-1 twin).
    if (xtext == 0) {
      val graded = docs0
        .withColumn("xf", ((col("doc_id") % 4) * 6 + 1).cast("int"))
        .withColumn("text", expr(
          "array_join(transform(sequence(0, xf - 1), i -> concat(text, ' seg', i)), ' ')"))
      val gvids = graded.select(col("doc_id"), col("text"))
        .union(graded.select((col("doc_id") + 100000).as("doc_id"), col("text")))
        .union(graded.select((col("doc_id") + 200000).as("doc_id"),
          concat(col("text"), lit(" xyzzy")).as("text")))
      val gmedia = Multimodal.asAviMediaTable(spark, gvids, "doc_id", "text",
        blocksPerRow = 10, frameBytes = 48).localCheckpoint()
      val gn = graded.count()
      val hashes = Multimodal.videoFrameDHash(spark, gmedia).localCheckpoint()
      println(s"PROBE graded bases=$gn videos=${gmedia.count()} frames=${hashes.count()}")
      for (tierMin <- Seq(1, 4, 8, 16, 32, 64, 256)) {
        val (pairs, t) = timed(
          Multimodal.videoNearDupPairsTieredFromHashes(spark, hashes,
            maxHamming = 1, minMatchFrac = 0.8, frameStride = 2,
            tierMinFrames = tierMin).localCheckpoint())
        val cls = pairs
          .withColumn("ba", col("id_a") % 100000).withColumn("bb", col("id_b") % 100000)
          .withColumn("va", (col("id_a") / 100000).cast("int"))
          .withColumn("vb", (col("id_b") / 100000).cast("int"))
          .withColumn("kind",
            when(col("ba") === col("bb"),
              when(col("va") + col("vb") === 1, "trio_v01").otherwise("trio_near"))
              .when(col("ba") % span === col("bb") % span, "xrep")
              .otherwise("xdoc"))
          .groupBy("kind").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        println(f"PROBE tierMin=$tierMin%3d  mine=$t%7.2f s  pairs=${pairs.count()}%9d  " +
          f"v01=${cls.getOrElse("trio_v01", 0L)}%6d/$gn%d  " +
          f"near=${cls.getOrElse("trio_near", 0L)}%6d  " +
          f"xrep=${cls.getOrElse("xrep", 0L)}%8d  xdoc=${cls.getOrElse("xdoc", 0L)}%9d")
        pairs.unpersist()
      }
      spark.stop()
      return
    }

    // mh=0 is rejected by design (exact equality → groupBy, not a pair
    // join), so the hamming axis sweeps the query's own mh=1 and the looser
    // mh=2; the tightening valves are minMatchFrac and frameStride.
    for ((mh, stride) <- Seq((1, 1), (2, 1), (1, 2), (1, 4))) {
      val (pairs, t) = timed(
        Multimodal.videoNearDupPairs(spark, media, maxHamming = mh,
          minMatchFrac = 0.0, frameStride = stride).localCheckpoint())
      for (mf <- Seq(0.8, 0.9, 1.0)) {
        val p = pairs.filter(col("match_frac") >= mf)
        val cls = p
          .withColumn("ba", col("id_a") % 100000).withColumn("bb", col("id_b") % 100000)
          .withColumn("va", (col("id_a") / 100000).cast("int"))
          .withColumn("vb", (col("id_b") / 100000).cast("int"))
          .withColumn("kind",
            when(col("ba") === col("bb"),
              when(col("va") + col("vb") === 1, "trio_v01").otherwise("trio_near"))
              .when(col("ba") % span === col("bb") % span, "xrep")
              .otherwise("xdoc"))
          .groupBy("kind").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val v01 = cls.getOrElse("trio_v01", 0L)
        val near = cls.getOrElse("trio_near", 0L)
        println(f"PROBE mh=$mh mf=$mf%.1f stride=$stride  join=$t%7.2f s  " +
          f"pairs=${p.count()}%9d  v01=$v01%6d/${nbases}%d  " +
          f"near=$near%6d/${2 * nbases}%d  xrep=${cls.getOrElse("xrep", 0L)}%8d  " +
          f"xdoc=${cls.getOrElse("xdoc", 0L)}%9d")
      }
      pairs.unpersist()
    }
    spark.stop()
  }
}
