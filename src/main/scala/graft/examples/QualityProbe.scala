package graft.examples
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage forensics for the corpus-quality family: where the seconds go in
  * q_c4_clean / q_lm_score / q_dsir_weights / q_semantic_dedup, and whether
  * a materialization barrier on the token explode (or pre-trained centroids
  * for SemDeDup) pays. Run: `runMain graft.examples.QualityProbe [sfDir]`.
  */
object QualityProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $name%-34s rows=$n%9d  ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    // --- c4_clean stages -------------------------------------------------
    val lined: DataFrame = {
      val base = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("__t"),
        (col("doc_id") % 5 + 4).cast("int").as("__k"))
      val nl = ceil(size(col("__t")).cast("double") / col("__k").cast("double")).cast("int")
      val lines = transform(sequence(lit(0), nl - 1),
        i => concat_ws(" ", slice(col("__t"), i * col("__k") + 1, col("__k"))))
      base.select(col("doc_id"), array_join(lines, "\n").as("text"))
    }
    time("c4: line-ize only")(lined.count())
    time("c4: line-ize + force text")(lined.agg(sum(length(col("text")))).count())
    val p1 = lined.select(col("doc_id"), split(col("text"), "\n").as("__lines"))
    time("c4: +split lines")(p1.agg(sum(size(col("__lines")))).count())
    val p2 = p1.select(col("doc_id"), col("__lines"),
      filter(col("__lines"), l => length(trim(l)) >= 5).as("__kept"))
    time("c4: +cheap kept filter")(p2.agg(sum(size(col("__kept")))).count())
    val p2b = p1.select(col("doc_id"), col("__lines"),
      filter(col("__lines"), l =>
        size(split(trim(l), " +")) >= 5).as("__kept"))
    time("c4: +wordcount kept filter")(p2b.agg(sum(size(col("__kept")))).count())
    val p3 = p2b.select(col("doc_id"),
      size(col("__lines")).as("n_lines"),
      size(col("__kept")).as("n_lines_kept"),
      array_join(col("__kept"), "\n").as("clean_text"))
    time("c4: p3 no gate, agg-forced")(
      p3.agg(sum(col("n_lines_kept")), sum(length(col("clean_text")))).count())
    time("c4: p3 + typed filter")(
      p3.filter((r: org.apache.spark.sql.Row) =>
        r.getInt(r.fieldIndex("n_lines_kept")) >= 3).count())
    time("c4: full")(QualityOps.c4Clean(lined, "doc_id", "text",
      requireTerminalPunct = false).count())
    time("c4: full again")(QualityOps.c4Clean(lined, "doc_id", "text",
      requireTerminalPunct = false).count())
    time("c4: full (checkpoint barrier)")(
      QualityOps.c4Clean(lined.localCheckpoint(), "doc_id", "text",
        requireTerminalPunct = false).count())

    // --- lm_score stages -------------------------------------------------
    time("lm: full")(QualityOps.lmScore(docs, "doc_id", "text").count())
    val toks = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("__t"))
      .select(col("doc_id"), explode(col("__t")).as("tok"))
    time("lm: token explode only")(toks.count())
    time("lm: explode+count+join")(
      toks.join(broadcast(toks.groupBy("tok").agg(count(lit(1)).as("c"))), Seq("tok")).count())

    // --- dsir stages -----------------------------------------------------
    time("dsir: full")(QualityOps.dsirWeights(docs, "doc_id", "text",
      col("lang") === "en", buckets = 64).count())
    time("dsir: polyhash buckets only")(
      toks.withColumn("bkt", pmod(TextOps.polyHash(col("tok")), lit(64))).count())

    // --- semantic dedup --------------------------------------------------
    val base = emb.select(col("vec_id"), col("embedding"))
    val corpus = base
      .union(base.filter(col("vec_id") % 3 === 0).select(col("vec_id") + 100000, col("embedding")))
      .union(base.filter(col("vec_id") % 6 === 0).select(col("vec_id") + 200000, col("embedding")))
    time("sem: full (train inside)")(
      Similarity.semDedup(corpus, "vec_id", "embedding", nlist = 8, tau = 0.9, iters = 2).count())
    time("sem: train only")(
      { Similarity.trainCentroids(corpus, "vec_id", "embedding", nlist = 8, iters = 2); corpus.limit(1).count() })
    val pretrained = Similarity.trainCentroids(corpus, "vec_id", "embedding", nlist = 16, iters = 2)
    time("sem: pre-trained centroids")(
      Similarity.semDedup(corpus, "vec_id", "embedding", nlist = 16, tau = 0.9,
        centroids = Some(pretrained)).count())
    spark.stop()
  }
}
