package graft.examples
import graft.operators.{Multimodal, Sampling}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage split for q_video_neardup's sf0.1→sf1 slope (r12): the full-battery
  * measurement read 25.7× on 10× data while the underlying frame count grows
  * only 12.3× (10× docs × ~1.23 from the ScaleUp text perturbation — longer
  * texts mean more 48-byte frames per video). This instrument times the
  * pipeline's three stages separately at any sf dir: (1) AVI/MJPEG ENCODE
  * (asAviMediaTable — one JPEG per frame + container assembly), (2) DECODE +
  * per-frame dHash (videoFrameDHash), (3) the blocked pigeonhole join + pair
  * aggregation, to attribute the residual ~2× beyond work growth.
  */
object VideoSlopeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .filter(Sampling.hashBucket(col("doc_id")) < 15)
    val vids = docs.select(col("doc_id"), col("text"))
      .union(docs.select((col("doc_id") + 100000).as("doc_id"), col("text")))
      .union(docs.select((col("doc_id") + 200000).as("doc_id"),
        concat(col("text"), lit(" xyzzy")).as("text")))
    val media = Multimodal.asAviMediaTable(spark, vids, "doc_id", "text",
      blocksPerRow = 10, frameBytes = 48)
    val m = time("encode")(media.localCheckpoint())
    println(s"PROBE videos=${m.count()}")
    val h = time("decode+dhash")(Multimodal.videoFrameDHash(spark, m).localCheckpoint())
    println(s"PROBE frames=${h.count()}")
    val pairs = time("pairs(join)")(
      Multimodal.videoNearDupPairs(spark, m, maxHamming = 1, minMatchFrac = 0.8)
        .localCheckpoint())
    println(s"PROBE pairs=${pairs.count()}")
    // Pair composition (r12): video ids are base + variant*100000, bases are
    // source_doc + replica*docSpan (ScaleUp). "trio" = the query's own
    // planted clone pair (same base); "xrep" = the same source doc in two
    // different replicas (ScaleUp perturbation leakage, if any); "xdoc" =
    // two genuinely different source documents — the corpus's intrinsic
    // template similarity, the only mass that may legitimately grow
    // ~quadratically with corpus size on synthetic template text.
    val span = args.lift(1).map(_.toLong).getOrElse(5000L)
    val cls = pairs
      .withColumn("ba", col("id_a") % 100000).withColumn("bb", col("id_b") % 100000)
      .withColumn("kind",
        when(col("ba") === col("bb"), "trio")
          .when(col("ba") % span === col("bb") % span, "xrep")
          .otherwise("xdoc"))
      .groupBy("kind").count().collect()
    cls.sortBy(_.getString(0)).foreach(r =>
      println(s"PROBE kind=${r.getString(0)} n=${r.getLong(1)}"))
    spark.stop()
  }
}
