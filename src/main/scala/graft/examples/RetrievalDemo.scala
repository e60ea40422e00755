package graft.examples

import graft.engine.{Catalog, KeyedTable, RetrievalDelta}
import graft.operators.Retrieval
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Drives the retrieval family end to end through the public API:
  * ad-hoc BM25, maintained-statistics BM25 after insert/edit/delete
  * epochs (scores must agree with ad-hoc over the same corpus), the
  * anti-entropy audit, and SQL over the registered state.
  *
  *   sbt "runMain graft.examples.RetrievalDemo /tmp/graft-retrieval1"
  */
object RetrievalDemo {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(sys.error("usage: RetrievalDemo <workDir>"))
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs0 = Seq(
      (1L, "spark streams merge windows into the fact table"),
      (2L, "the quick brown fox avoids spark entirely"),
      (3L, "window functions stream results while spark plans merge joins"),
      (4L, "nothing relevant here at all"),
      (5L, "merge merge merge repeated until saturation says stop"),
    ).toDF("doc_id", "text")
    val terms = Seq("spark", "merge", "window", "stream")

    println("== ad-hoc BM25 over the 5-doc corpus ==")
    Retrieval.bm25TopK(docs0, "doc_id", "text", terms, k = 5).show(false)

    val docsT = KeyedTable(spark, s"$root/docs", Seq("doc_id"), numBuckets = 4)
    val dfT = KeyedTable(spark, s"$root/df", Seq("tok"), numBuckets = 4)
    val corpusT = KeyedTable(spark, s"$root/corpus", Seq("scope"))
    RetrievalDelta.bootstrap(docsT, dfT, corpusT, docs0)

    println("== epoch 1: doc 6 arrives, doc 4 is deleted, doc 2 is edited ==")
    RetrievalDelta.maintain(docsT, dfT, corpusT, Seq(
      (6L, "streams of sparks", null, "I", 1L),
      (4L, null, "nothing relevant here at all", "D", 1L),
      (2L, "the fox now streams spark windows", "the quick brown fox avoids spark entirely", "U", 1L),
    ).toDF("doc_id", "text", "_old_text", "_op", "_seq"), batchId = Some("demo-e1"))

    val toks = docsT.current.select(col("doc_id"),
      graft.operators.TextOps.tokens(col("text")).as("__w"))
    val hits = toks.select(col("doc_id"), size(col("__w")).cast("long").as("dl"),
        explode(col("__w")).as("tok"))
      .filter(col("tok").isin(terms: _*))
    val tf = hits.groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
    val dfr = dfT.current.filter(col("tok").isin(terms: _*))
      .select(col("tok"), col("cnt").as("df"))
    val tot = corpusT.current.select(col("sum_dl").cast("long").as("N_T"),
      col("cnt").as("N_N"))
    println("== BM25 from MAINTAINED stats (post-epoch corpus) ==")
    val viaState = Retrieval.scoreAndRank(
      tf.join(broadcast(dfr), "tok").crossJoin(broadcast(tot)), "doc_id", 5)
    viaState.show(false)
    println("== ad-hoc over the same current corpus (must match exactly) ==")
    val adhoc = Retrieval.bm25TopK(docsT.current, "doc_id", "text", terms, 5)
    adhoc.show(false)
    val same = viaState.collect().map(_.toSeq).toSeq == adhoc.collect().map(_.toSeq).toSeq
    println(s"maintained == ad-hoc: $same (expect true)")

    println("== anti-entropy audit of the df table ==")
    val expected = docsT.current.select(col("doc_id"),
        explode(array_distinct(graft.operators.TextOps.tokens(col("text")))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    graft.engine.Audit.viewAudit(dfT, expected, Seq("tok")).show(false)

    println("== SQL over the registered state ==")
    Catalog.sqlOver(spark, Map("term_df" -> dfT, "corpus_totals" -> corpusT),
      """SELECT tok, cnt AS df FROM term_df
        |ORDER BY df DESC, tok LIMIT 5""".stripMargin).show(false)

    spark.stop()
  }
}
