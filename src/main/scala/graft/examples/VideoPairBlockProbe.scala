package graft.examples

import graft.operators.{Dedup, Multimodal}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Candidate-mass A/B + equality gate for the r19 video-family rewrite (r18
  * verdict Next #1): the plain/s2 miners' wall was the 85.6M-row pair-group
  * shuffle whose map-side partial aggregation collapses nothing (avg ~1.2
  * matching positions per candidate pair — PROBE_vtier_r18.txt TIERDECOMP).
  * The rewrite blocks candidates on consecutive sampled-position PAIRS
  * (both positions must match within maxHamming — the pigeonhole guarantee
  * for minMatchFrac ≥ 0.75) and verifies survivors exactly against
  * per-video signature arrays. This probe times the OLD per-position
  * pipeline (inlined below, byte-for-byte the pre-r19 operator body)
  * against the rewritten operator, decomposes the new pipeline's stages,
  * and checks row-identity with exceptAll in both directions.
  *
  * `runMain graft.examples.VideoPairBlockProbe <sfDir> [stride]`.
  */
object VideoPairBlockProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val stride = args.lift(1).map(_.toInt).getOrElse(1)
    val maxH = 1
    val minFrac = 0.8
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val vh = graft.queries.Td.videoHashTable(spark, d)
      .repartition(32, col("media_id")).localCheckpoint()
    // ---- OLD pipeline, inlined (the pre-r19 operator body) ----------------
    def oldPipeline(): DataFrame = {
      val h = if (stride == 1) vh else vh.filter(col("frame_idx") % stride === 0)
      val lens = vh.groupBy("media_id").agg(max(col("n_frames")).as("nf"))
      val framePairs = Dedup.hammingPairsBlocked(h, "media_id", "frame_idx",
        "dhash", bits = 64, maxHamming = maxH)
      val sampledComparable =
        floor((least(col("__na"), col("__nb")) - 1) / stride) + 1
      framePairs.groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("n_matching"))
        .join(lens.select(col("media_id").as("id_a"), col("nf").as("__na")), Seq("id_a"))
        .join(lens.select(col("media_id").as("id_b"), col("nf").as("__nb")), Seq("id_b"))
        .withColumn("n_comparable",
          (if (stride == 1) least(col("__na"), col("__nb"))
           else sampledComparable).cast("long"))
        .withColumn("match_frac",
          col("n_matching").cast("double") / col("n_comparable").cast("double"))
        .filter(col("match_frac") >= minFrac)
        .select("id_a", "id_b", "n_matching", "n_comparable", "match_frac")
    }
    val (nOld, tOld) = timed(oldPipeline().count())
    println(f"OLDOP stride=$stride wall=$tOld%.1f s out=$nOld pairs")
    // ---- NEW operator ------------------------------------------------------
    val (nNew, tNew) = timed(Multimodal.videoNearDupPairsFromHashes(spark,
      vh, maxHamming = maxH, minMatchFrac = minFrac, frameStride = stride).count())
    println(f"NEWOP stride=$stride wall=$tNew%.1f s out=$nNew pairs")
    // ---- decomposition of the new pipeline's candidate stages -------------
    val perV = vh.groupBy("media_id").agg(max("n_frames").as("nf"),
        transform(array_sort(collect_list(struct(col("frame_idx"), col("dhash")))),
          x => x.getField("dhash")).as("sig"))
      .localCheckpoint()
    val (nV, tV) = timed(perV.count())
    val S = (floor((col("nf") - 1) / stride) + 1).cast("int")
    val npp = (S / lit(2)).cast("int")
    val pp0 = perV.select(col("media_id").as("id"), col("sig"),
        explode(when(npp >= 1, sequence(lit(0), npp - 1))
          .otherwise(array().cast("array<int>"))).as("t"))
      .select(col("id"), col("t"),
        element_at(col("sig"), col("t") * (2 * stride) + 1).as("f1"),
        element_at(col("sig"), col("t") * (2 * stride) + stride + 1).as("f2"))
    def chunk(sh: Column, c: Int): Column =
      if (c == 0) sh.bitwiseAND(lit(0xFFFFFFFFL))
      else shiftright(sh, 32).bitwiseAND(lit(0xFFFFFFFFL))
    val comboList = for { c1 <- 0 to 1; c2 <- 0 to 1 } yield (c1, c2)
    val ex = pp0.select(col("id"), col("t"), col("f1"), col("f2"),
        explode(array(comboList.map { case (c1, c2) =>
          struct(lit(c1).as("c1"), lit(c2).as("c2"),
            chunk(col("f1"), c1).as("v1"), chunk(col("f2"), c2).as("v2"))
        }: _*)).as("k"))
      .select(col("id"), col("t"), col("f1"), col("f2"),
        col("k.c1").as("c1"), col("k.c2").as("c2"),
        col("k.v1").as("v1"), col("k.v2").as("v2"))
    val (nEx, tEx) = timed(ex.count())
    val mrow = ex.groupBy("t", "c1", "c2", "v1", "v2").agg(count(lit(1)).as("w"))
      .agg(sum(col("w") * (col("w") - 1) / 2).cast("long"), max(col("w"))).collect()(0)
    println(f"PPMASS videos=$nV ($tV%.1f s) exploded=$nEx ($tEx%.1f s) " +
      f"mass=${mrow.getLong(0)} wmax=${mrow.getLong(1)}")
    def firstCombo(f1a: Column, f2a: Column, f1b: Column, f2b: Column): Column =
      comboList.foldRight(struct(lit(-1).as("c1"), lit(-1).as("c2"))) {
        case ((c1, c2), els) =>
          when(chunk(f1a, c1) === chunk(f1b, c1) && chunk(f2a, c2) === chunk(f2b, c2),
            struct(lit(c1).as("c1"), lit(c2).as("c2"))).otherwise(els)
      }
    val cand = ex.as("a").join(ex.as("b"),
        col("a.t") === col("b.t") && col("a.c1") === col("b.c1") &&
          col("a.c2") === col("b.c2") && col("a.v1") === col("b.v1") &&
          col("a.v2") === col("b.v2") && col("a.id") < col("b.id"))
      .filter(bit_count(col("a.f1").bitwiseXOR(col("b.f1"))) <= maxH &&
        bit_count(col("a.f2").bitwiseXOR(col("b.f2"))) <= maxH)
      .filter(struct(col("a.c1"), col("a.c2")) ===
        firstCombo(col("a.f1"), col("a.f2"), col("b.f1"), col("b.f2")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val (nCand, tCand) = timed(cand.count())
    val (nPairs, tPairs) = timed(cand.distinct().count())
    println(f"CAND rows=$nCand ($tCand%.1f s) distinct=$nPairs ($tPairs%.1f s)")
    // ---- equality gate -----------------------------------------------------
    val newDf = Multimodal.videoNearDupPairsFromHashes(spark, vh,
      maxHamming = maxH, minMatchFrac = minFrac, frameStride = stride)
    val oldDf = oldPipeline()
    val extra = newDf.exceptAll(oldDf).count()
    val missing = oldDf.exceptAll(newDf).count()
    println(s"EQUALITY extra=$extra missing=$missing " +
      (if (extra == 0 && missing == 0) "IDENTICAL" else "MISMATCH"))
    spark.stop()
  }
}
