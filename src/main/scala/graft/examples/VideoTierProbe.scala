package graft.examples

import graft.operators.{Dedup, Multimodal}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-tier routing and candidate-mass decomposition for
  * q_video_neardup_tiered's router (r17 verdict Next #6): the tier
  * thresholds (tierMinFrames=8, frameStride=2) were calibrated on r16 data;
  * the regenerated corpus carries ~5× the near-dup frame mass and the
  * tiered-vs-exact margin thinned (73.7 s vs 88.1 s at sf1, from 18.9 vs
  * 47.6). This prints, from the stored signature table:
  *
  *   - the tier split (media + frame rows per tier, cross-prefix rows);
  *   - per-branch candidate-pair mass Σ C(w,2) / Σ w_a·w_b over the
  *     (frame_idx, chunk) buckets each branch actually joins on — the cost
  *     model of the three disjoint miners vs the exact single-join;
  *   - measured per-branch walls (mine-only counts) and the two composed
  *     operators' walls (exact stride-1 vs tiered).
  *
  * `runMain graft.examples.VideoTierProbe <sfDir> [tierMin] [stride]`.
  */
object VideoTierProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tierMin = args.lift(1).map(_.toInt).getOrElse(8)
    val stride = args.lift(2).map(_.toInt).getOrElse(2)
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // the same width-normalized shape the operator mines (mineWidth)
    val vh = graft.queries.Td.videoHashTable(spark, d)
      .repartition(32, col("media_id")).localCheckpoint()
    val lens = vh.groupBy("media_id").agg(max("n_frames").as("nf"))
      .withColumn("short", col("nf") < tierMin).localCheckpoint()
    val shortIds = lens.filter(col("short")).select("media_id")
    val longIds = lens.filter(!col("short")).select("media_id")
    val shortFrames = vh.join(shortIds, Seq("media_id")).localCheckpoint()
    val longFrames = vh.join(longIds, Seq("media_id")).localCheckpoint()
    val longPrefix = longFrames.filter(col("frame_idx") < tierMin).localCheckpoint()
    val stridedLong = longFrames.filter(col("frame_idx") % stride === 0).localCheckpoint()
    println(f"TIERSPLIT tierMin=$tierMin stride=$stride " +
      f"shortMedia=${shortIds.count()} longMedia=${longIds.count()} " +
      f"shortFrames=${shortFrames.count()} longFrames=${longFrames.count()} " +
      f"longPrefixFrames=${longPrefix.count()} stridedLongFrames=${stridedLong.count()}")
    // candidate mass over the (frame_idx, 32-bit chunk) buckets at
    // maxHamming=1 — the key hammingPairsBlocked actually joins on
    def buckets(df: DataFrame): DataFrame = df
      .select(col("frame_idx"), lit(0).as("cidx"),
        shiftright(col("dhash"), 32).as("cval"))
      .unionAll(df.select(col("frame_idx"), lit(1).as("cidx"),
        col("dhash").bitwiseAND(lit(0xFFFFFFFFL)).as("cval")))
      .groupBy("frame_idx", "cidx", "cval").agg(count(lit(1)).as("w"))
    def selfMass(df: DataFrame): (Long, Long) = {
      val r = buckets(df).agg(
        sum(col("w") * (col("w") - 1) / 2).cast("long"), max(col("w"))).collect()(0)
      (if (r.isNullAt(0)) 0L else r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    def crossMass(a: DataFrame, b: DataFrame): Long = {
      val r = buckets(a).as("a").join(buckets(b).as("b"),
          Seq("frame_idx", "cidx", "cval"))
        .agg(sum(col("a.w") * col("b.w")).cast("long")).collect()(0)
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    val (mShort, wShort) = selfMass(shortFrames)
    val (mLong, wLong) = selfMass(stridedLong)
    val mCross = crossMass(shortFrames, longPrefix)
    val (mExact, wExact) = selfMass(vh)
    println(f"TIERMASS shortSelf=$mShort (wmax=$wShort) cross=$mCross " +
      f"longSelfStrided=$mLong (wmax=$wLong) tieredTotal=${mShort + mCross + mLong} " +
      f"exactFull=$mExact (wmax=$wExact)")
    // measured walls: the three branch miners alone, then the composed ops
    val (_, tShort) = timed(Dedup.hammingPairsBlocked(shortFrames, "media_id",
      "frame_idx", "dhash", bits = 64, maxHamming = 1).count())
    val (_, tCross) = timed(Dedup.hammingPairsBlockedCross(shortFrames, longPrefix,
      "media_id", "frame_idx", "dhash", bits = 64, maxHamming = 1).count())
    val (_, tLong) = timed(Dedup.hammingPairsBlocked(stridedLong, "media_id",
      "frame_idx", "dhash", bits = 64, maxHamming = 1).count())
    println(f"TIERWALL shortSelf=$tShort%.1f cross=$tCross%.1f longSelfStrided=$tLong%.1f s")
    val (nExact, tExact) = timed(Multimodal.videoNearDupPairsFromHashes(spark,
      vh, maxHamming = 1, minMatchFrac = 0.8).count())
    val (nTiered, tTiered) = timed(Multimodal.videoNearDupPairsTieredFromHashes(spark,
      vh, maxHamming = 1, minMatchFrac = 0.8, frameStride = stride,
      tierMinFrames = tierMin).count())
    println(f"TIEROPS exact=$tExact%.1f s ($nExact pairs) " +
      f"tiered=$tTiered%.1f s ($nTiered pairs)")
    // stage decomposition of the single-tagged-mine plan (r18): where the
    // tiered op's wall goes beyond the exact miner's
    val lens2 = vh.groupBy("media_id").agg(max("n_frames").as("nf"))
      .withColumn("short", col("nf") < tierMin).localCheckpoint()
    val frames = vh.join(lens2.select("media_id", "short"), Seq("media_id"))
      .filter(col("short") || col("frame_idx") < tierMin ||
        col("frame_idx") % stride === 0)
    val (nFrames, tFrames) = timed(frames.count())
    val fp = Dedup.hammingPairsBlockedTagged(frames, "media_id",
        "frame_idx", "dhash", "short", bits = 64, maxHamming = 1)
    val (nFp, tFp) = timed(fp.count())
    val kept = fp.filter(col("tag_a") || col("tag_b") ||
      col("block") % stride === 0)
    val (nKept, tKept) = timed(kept.count())
    val (nGrp, tGrp) = timed(kept.groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_matching"),
        first(col("tag_a")).as("sa"), first(col("tag_b")).as("sb")).count())
    println(f"TIERDECOMP frames=$nFrames ($tFrames%.1f s) minedPairs=$nFp " +
      f"($tFp%.1f s) keptPairs=$nKept ($tKept%.1f s) groups=$nGrp ($tGrp%.1f s)")
    // s2 (plain stride) decomposition under the r18 signature-class
    // collapse: where does the strided variant's wall go?
    val (nS2, tS2) = timed(Multimodal.videoNearDupPairsFromHashes(spark,
      vh, maxHamming = 1, minMatchFrac = 0.8, frameStride = stride).count())
    println(f"S2OP wall=$tS2%.1f s out=$nS2 pairs")
    val perV = vh.groupBy("media_id").agg(max("n_frames").as("nf"),
      transform(array_sort(collect_list(struct(col("frame_idx"), col("dhash")))),
        x => x.getField("dhash")).as("sig"))
    val cls = perV.groupBy("nf", "sig")
      .agg(min(col("media_id")).as("rep"), count(lit(1)).as("m")).localCheckpoint()
    val (nCls, tCls) = timed(cls.count())
    val repStr = vh.join(cls.select(col("rep").as("media_id")), Seq("media_id"))
      .filter(col("frame_idx") % stride === 0)
    val s2fp = Dedup.hammingPairsBlocked(repStr, "media_id", "frame_idx", "dhash",
      bits = 64, maxHamming = 1)
    val (nS2fp, tS2fp) = timed(s2fp.count())
    val (nS2grp, tS2grp) = timed(
      s2fp.groupBy("id_a", "id_b").agg(count(lit(1)).as("n")).count())
    println(f"S2DECOMP classes=$nCls ($tCls%.1f s) repMinedPairs=$nS2fp " +
      f"($tS2fp%.1f s) repGroups=$nS2grp ($tS2grp%.1f s)")
    spark.stop()
  }
}
