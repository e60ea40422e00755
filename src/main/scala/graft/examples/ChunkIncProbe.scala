package graft.examples
import graft.operators._
import graft.queries.Td
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r18 optimization-round decomposition of q_chunk_inc_neardup (the top
  * sf0.1 battery entry, 5.7 s on the r18 baseline box): times each stage of
  * the probe path — batch chunking, batch reps, the exact arm, and every
  * internal stage of dedupAgainstIndex at the chunk family's 32x1 banding —
  * so the optimization targets the measured wall, not a guess.
  */
object ChunkIncProbe {
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
      println(f"PROBE $name%-28s rows=$n%9d  ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val docs = Td.documents(spark, d)
    val batch = docs.filter(Sampling.hashBucket(col("doc_id")) >= 80)
    val (reps, idx, st) = Td.chunkBandTables(spark, d)
    time("warm:reps.count")(reps.count())
    time("warm:idx.count")(idx.count())
    // full query, min-of-2 to see the warm floor — stored-state path first
    time("FULL q state (run1)")(Dedup.chunkIncNearDup(batch, "doc_id", "text", reps, idx,
      chunkSize = 16, stride = 16, n = 3, tau = 0.5, corpusState = Some(st)).count())
    time("FULL q state (run2)")(Dedup.chunkIncNearDup(batch, "doc_id", "text", reps, idx,
      chunkSize = 16, stride = 16, n = 3, tau = 0.5, corpusState = Some(st)).count())
    time("FULL q derived (run1)")(Dedup.chunkIncNearDup(batch, "doc_id", "text", reps, idx,
      chunkSize = 16, stride = 16, n = 3, tau = 0.5).count())
    time("FULL q derived (run2)")(Dedup.chunkIncNearDup(batch, "doc_id", "text", reps, idx,
      chunkSize = 16, stride = 16, n = 3, tau = 0.5).count())
    // ---- stage decomposition --------------------------------------------
    val ch = Dedup.chunkCids(batch, "doc_id", "text", 16, 16)
    time("chunkCids(batch)")(ch.count())
    val repsB = ch.groupBy("chunk_text").agg(min(col("cid")).as("cid"))
    time("repsB")(repsB.count())
    time("exactDrop semi")(repsB
      .join(reps.select(col("chunk_text")), Seq("chunk_text"), "left_semi").count())
    // dedupAgainstIndex internals at 32x1
    val ex = Dedup.explodedShingles(
      repsB.select(col("cid"), col("chunk_text")), "cid", "chunk_text", 3)
    time("explodedShingles(repsB)")(ex.count())
    val hashed = ex.select(col("id"), col("s"), graft.operators.TextOps.polyHash(col("s")).as("h"))
    val minAggs = (0 until 32).map(i =>
      min((lit(Dedup.aCoef(i)) * col("h") + lit(Dedup.bCoef(i))) % Dedup.MinHashP).as(s"mh$i"))
    val state = hashed.groupBy("id").agg(
      minAggs.head,
      (minAggs.tail :+ collect_list(col("s")).as("arr") :+ count(lit(1)).as("n_sh")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("state agg+persist")(state.count())
    val sigCols = ("id" +: (0 until 32).map(i => s"mh$i")).map(col)
    val sig = Dedup.withBands(state.select(sigCols: _*), bands = 32, rowsPerBand = 1)
    val bBuckets = sig.select(col("id"), posexplode(
        array((0 until 32).map(j => col(s"band$j")): _*)).as(Seq("band_idx", "band_val")))
      .filter(col("band_val").isNotNull)
    time("bBuckets")(bBuckets.count())
    val internal = bBuckets.as("a").join(bBuckets.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    time("internal cands")(internal.count())
    val cross = bBuckets.join(
        idx.select(col("id").as("cid"), col("band_idx"), col("band_val")),
        Seq("band_idx", "band_val"))
      .select(col("cid"), col("id").as("bid")).distinct()
    time("cross cands")(cross.count())
    val crossCk = cross.localCheckpoint()
    val candCorpus = reps.select(col("cid"), col("chunk_text")).join(
      crossCk.select(col("cid").as("__cand_id")).distinct(),
      col("cid") === col("__cand_id"), "left_semi")
    val cState = Dedup.explodedShingles(candCorpus, "cid", "chunk_text", 3)
      .groupBy("id").agg(collect_list(col("s")).as("arr"), count(lit(1)).as("n_sh"))
    time("cState")(cState.count())
    spark.stop()
  }
}
