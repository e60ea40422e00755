package graft.examples
import graft.functions.Kernels
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object EdgeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // FloatDot edge cases vs HOF reference
    val df = Seq(
      (1L, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),   // same length
      (2L, Seq(1.0f, 2.0f), Seq(3.0f)),          // mismatch → null
      (3L, Seq.empty[Float], Seq.empty[Float]),  // empty → 0.0
    ).toDF("id", "a", "b")
    val out = df.select(col("id"),
      Kernels.float_dot(col("a"), col("b")).as("kernel"),
      expr("aggregate(zip_with(a, b, (x, y) -> x*y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)").as("hof"))
    out.show()
    out.collect().foreach { r =>
      val k = if (r.isNullAt(1)) null else r.getDouble(1)
      val h = if (r.isNullAt(2)) null else r.getDouble(2)
      println(s"EDGE id=${r.getLong(0)} kernel=$k hof=$h match=${k == h}")
    }
    // null input
    val n = Seq((4L, Option.empty[Seq[Float]], Option(Seq(1.0f)))).toDF("id", "a", "b")
      .select(Kernels.float_dot(col("a"), col("b")).as("d")).collect()(0)
    println(s"EDGE null-input → isNull=${n.isNullAt(0)}")
    // codegen presence: explain of a kernel-using plan
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = emb.select(Kernels.float_dot(col("embedding"), col("embedding")).as("d"),
      graft.functions.Kernels.poly_hash(lit("abc")).as("h"))
    val s = plan.queryExecution.executedPlan.toString
    println("EDGE plan codegen'd (starred): " + s.contains("*(1) Project [floatdot"))
    // VocabCount edge cases vs HOF reference
    val vdf = Seq(
      (1L, Seq("the","fox","the","and")),
      (2L, Seq.empty[String]),
      (3L, Seq("nope")),
    ).toDF("id", "t")
    val vres = vdf.select(col("id"),
      Kernels.vocab_count(col("t"), Seq("the","and","of")).as("kernel"),
      size(filter(col("t"), x => x.isin("the","and","of"))).as("hof")).collect()
    vres.foreach(r => println(s"EDGE vocab id=${r.getLong(0)} kernel=${r.getInt(1)} hof=${r.getInt(2)} match=${r.getInt(1)==r.getInt(2)}"))
    println("EDGE polyhash('abc') = " + plan.collect()(0).getLong(1) + " (expect (('a'*31+'b')*31+'c') % 1e9+7 = " + ((( 'a'.toLong*31+'b')*31+'c') % 1000000007L) + ")")
    // SkewOps drive: hot-key join through the public API
    val hotL = ((1 to 10000).map(_ => ("hot", 1)) ++ Seq(("cold", 2))).toDF("k", "lv")
    val hotR = Seq(("hot", 10), ("cold", 20), ("unused", 30)).toDF("k", "rv")
    val sj = graft.operators.SkewOps.saltedJoin(hotL, hotR, "k", 16).groupBy("k").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    println(s"EDGE saltedJoin: $sj (expect hot->10000, cold->1)")
    // multimodal null-payload probe: null text → null content → null decode
    // row (the job must not die), real text → parsed BMP geometry + sums
    val mdf = Seq((1L, "hello"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val media = graft.operators.Multimodal.asBmpMediaTable(spark, mdf, "doc_id", "text")
    val feats = graft.operators.Multimodal.decodeFeatures(spark, media).collect()
    feats.sortBy(_.getLong(0)).foreach(r => println(
      s"EDGE multimodal id=${r.getLong(0)} width=${if (r.isNullAt(3)) "null" else r.getInt(3)}" +
        s" sum_px=${if (r.isNullAt(5)) "null" else r.getLong(5)}"))
    spark.stop()
  }
}
