package graft.examples
import graft.operators._
import graft.queries.Td
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r19 follow-up to [[ChunkIncProbe]]: the r18 decomposition left "internal
  * cands + cross cands + verify" as the wall. This isolates the JOIN
  * STRATEGY choices inside that wall — the cross probe join's build side
  * and the two verify joins that attach (id, arr, n_sh) state to the
  * 16.8M-pair candidate stream — and A/Bs explicit broadcasts, which the
  * planner cannot pick on its own because the stream sits behind
  * size-unknown aggregates.
  *
  * `runMain graft.examples.ChunkIncProbe2 <sfDir>`.
  */
object ChunkIncProbe2 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $name%-34s rows=$n%9d  ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val docs = Td.documents(spark, d)
    val batch = docs.filter(Sampling.hashBucket(col("doc_id")) >= 80)
    val (reps, idx, st) = Td.chunkBandTables(spark, d)
    reps.count(); idx.count(); st.count() // warm installs
    // batch state, persisted exactly as dedupAgainstIndex does
    val ch = Dedup.chunkCids(batch, "doc_id", "text", 16, 16)
    val repsB = ch.groupBy("chunk_text").agg(min(col("cid")).as("cid"))
    val ex = Dedup.explodedShingles(
      repsB.select(col("cid"), col("chunk_text")), "cid", "chunk_text", 3)
    val hashed = ex.select(col("id"), col("s"), TextOps.polyHash(col("s")).as("h"))
    val minAggs = (0 until 32).map(i =>
      min((lit(Dedup.aCoef(i)) * col("h") + lit(Dedup.bCoef(i))) % Dedup.MinHashP).as(s"mh$i"))
    val state = hashed.groupBy("id").agg(
      minAggs.head,
      (minAggs.tail :+ collect_list(col("s")).as("arr") :+ count(lit(1)).as("n_sh")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    state.count()
    val sigCols = ("id" +: (0 until 32).map(i => s"mh$i")).map(col)
    val sig = Dedup.withBands(state.select(sigCols: _*), bands = 32, rowsPerBand = 1)
    val bBuckets = sig.select(col("id"), posexplode(
        array((0 until 32).map(j => col(s"band$j")): _*)).as(Seq("band_idx", "band_val")))
      .filter(col("band_val").isNotNull).localCheckpoint()
    val idxSlim = idx.select(col("id").as("cid"), col("band_idx"), col("band_val"))
    // 1. cross join alone vs +distinct, plain vs broadcast build side
    val joinedPlain = bBuckets.join(idxSlim, Seq("band_idx", "band_val"))
      .select(col("cid"), col("id").as("bid"))
    time("cross join (plain)")(joinedPlain.count())
    val joinedB = broadcast(bBuckets).join(idxSlim, Seq("band_idx", "band_val"))
      .select(col("cid"), col("id").as("bid"))
    time("cross join (bcast batch)")(joinedB.count())
    time("cross+distinct (plain)")(joinedPlain.distinct().count())
    time("cross+distinct (bcast)")(joinedB.distinct().count())
    val cross = joinedPlain.distinct().localCheckpoint()
    // 2. verify joins: as-planned vs broadcast state sides
    def verify(c: DataFrame, left: DataFrame, right: DataFrame): DataFrame = c
      .join(left.select(col("id").as("cid"), col("arr").as("arr_a"), col("n_sh").as("n_a")), "cid")
      .join(right.select(col("id").as("bid"), col("arr").as("arr_b"), col("n_sh").as("n_b")), "bid")
      .withColumn("inter", size(array_intersect(col("arr_a"), col("arr_b"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= 0.5)
    time("verify cross (plain)")(verify(cross, st, state).count())
    time("verify cross (bcast states)")(verify(cross, broadcast(st), broadcast(state)).count())
    spark.stop()
  }
}
