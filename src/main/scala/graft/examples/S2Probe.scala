package graft.examples

import graft.operators.{Dedup, Multimodal}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Clean-JVM stage decomposition of the class-collapsed strided video
  * miner (r18) — run FIRST thing so block-manager state can't inflate any
  * stage. `runMain graft.examples.S2Probe <sfDir> [stride]`.
  */
object S2Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/tmp/graft-sf1")
    val stride = args.lift(1).map(_.toInt).getOrElse(2)
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val vh0 = graft.queries.Td.videoHashTable(spark, d)
    val (_, tH0) = timed(vh0.count()) // warm the parquet read
    val (nOp, tOp) = timed(Multimodal.videoNearDupPairsFromHashes(spark,
      vh0, maxHamming = 1, minMatchFrac = 0.8, frameStride = stride).count())
    println(f"S2CLEAN warm=$tH0%.1f op=$tOp%.1f s out=$nOp")
    // piecewise with EAGER cuts: each stage builds from the previous
    // checkpoint and is counted INSIDE its timed block, so nothing executes
    // untimed and the sum is comparable to the fused op
    val (h0, tCk) = timed {
      val h = vh0.repartition(32, col("media_id")).localCheckpoint(); h.count(); h
    }
    val (cls, tCls) = timed {
      val perV = h0.groupBy("media_id").agg(max(col("n_frames")).as("nf"),
        transform(array_sort(collect_list(struct(col("frame_idx"), col("dhash")))),
          x => x.getField("dhash")).as("__sig"))
      val c = perV.groupBy("nf", "__sig")
        .agg(min(col("media_id")).as("rep"), collect_list(col("media_id")).as("members"))
        .select("rep", "nf", "members").localCheckpoint()
      c.count(); c
    }
    val (fpCk, tFp) = timed {
      val repFrames = h0.join(cls.select(col("rep").as("media_id")), Seq("media_id"))
        .filter(col("frame_idx") % stride === 0)
      val f = Dedup.hammingPairsBlocked(repFrames, "media_id", "frame_idx", "dhash",
        bits = 64, maxHamming = 1).localCheckpoint()
      f.count(); f
    }
    val lens = cls.select(col("rep"), col("nf"))
    val (repCk, tRp) = timed {
      val r = fpCk.groupBy("id_a", "id_b").agg(count(lit(1)).as("n_matching"))
        .join(lens.select(col("rep").as("id_a"), col("nf").as("__na")), Seq("id_a"))
        .join(lens.select(col("rep").as("id_b"), col("nf").as("__nb")), Seq("id_b"))
        .withColumn("n_comparable",
          (floor((least(col("__na"), col("__nb")) - 1) / stride) + 1).cast("long"))
        .withColumn("match_frac",
          col("n_matching").cast("double") / col("n_comparable").cast("double"))
        .filter(col("match_frac") >= 0.8)
        .localCheckpoint()
      r.count(); r
    }
    val (nCx, tCx) = timed {
      repCk
        .join(cls.select(col("rep").as("id_a"), explode(col("members")).as("__ma")), Seq("id_a"))
        .join(cls.select(col("rep").as("id_b"), explode(col("members")).as("__mb")), Seq("id_b"))
        .count()
    }
    println(f"S2PIECES ckpt=$tCk%.1f cls=$tCls%.1f mine=$tFp%.1f (${fpCk.count()}) " +
      f"group+frac=$tRp%.1f (${repCk.count()}) expand=$tCx%.1f ($nCx)")
    // OLD-path pieces (no collapse): same methodology for the A/B
    val (ofpCk, tOFp) = timed {
      val f = Dedup.hammingPairsBlocked(h0.filter(col("frame_idx") % stride === 0),
        "media_id", "frame_idx", "dhash", bits = 64, maxHamming = 1).localCheckpoint()
      f.count(); f
    }
    val olens = h0.groupBy("media_id").agg(max(col("n_frames")).as("nf")).localCheckpoint()
    val (nORp, tORp) = timed {
      ofpCk.groupBy("id_a", "id_b").agg(count(lit(1)).as("n_matching"))
        .join(olens.select(col("media_id").as("id_a"), col("nf").as("__na")), Seq("id_a"))
        .join(olens.select(col("media_id").as("id_b"), col("nf").as("__nb")), Seq("id_b"))
        .withColumn("n_comparable",
          (floor((least(col("__na"), col("__nb")) - 1) / stride) + 1).cast("long"))
        .withColumn("match_frac",
          col("n_matching").cast("double") / col("n_comparable").cast("double"))
        .filter(col("match_frac") >= 0.8)
        .count()
    }
    println(f"S2OLD mine=$tOFp%.1f (${ofpCk.count()}) group+frac=$tORp%.1f ($nORp)")
    val plan = Multimodal.videoNearDupPairsFromHashes(spark,
      vh0, maxHamming = 1, minMatchFrac = 0.8, frameStride = stride)
    val ep = plan.queryExecution.executedPlan.toString
    for (k <- Seq("Exchange", "HashAggregate", "SortMergeJoin", "BroadcastHashJoin",
        "Scan ExistingRDD", "LocalCheckpoint", "Generate", "CartesianProduct",
        "BroadcastNestedLoopJoin"))
      println(s"PLANCOUNT $k = " + k.r.findAllIn(ep).size)
    spark.stop()
  }
}
