package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {

  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "spark merge window stream"),          // all 4 query terms, short
      (2L, "spark spark spark filter join"),      // one term, high tf
      (3L, "merge window the the the the the the the the the the"), // 2 terms, long
      (4L, "filter join sort table"),             // no query terms
      (5L, "window stream"),                      // 2 terms, shortest
    ).toDF("doc_id", "text")
  }
  private val terms = Seq("spark", "merge", "window", "stream")

  test("bm25TopK: coverage beats repetition, length normalization demotes") {
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text", terms, k = 10)
      .orderBy("rank").collect()
    // doc 4 has no query term: absent entirely
    assert(out.map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 5L))
    // doc 1 matches all four terms in a short doc → top
    assert(out.head.getLong(0) == 1L)
    assert(out.head.getLong(out.head.fieldIndex("n_terms")) == 4L)
    // tf saturation: doc 2's tf=3 on one term cannot outrank doc 5's two
    // distinct terms in the shortest doc
    val byId = out.map(r => r.getLong(0) -> r.getLong(r.fieldIndex("score_fp"))).toMap
    assert(byId(5L) > byId(2L))
    // length normalization: doc 3 shares terms {merge, window} with doc 5's
    // {window, stream} (equal idf sets by symmetry is NOT guaranteed — but
    // its 12-token dl must score below doc 5's 2-token dl for the shared
    // 'window' term); coarse check: 3 ranks last among matchers
    assert(out.last.getLong(0) == 3L)
    // ranks are 1..n with no gaps
    assert(out.map(_.getInt(out.head.fieldIndex("rank"))).toSeq == (1 to 4))
  }

  test("bm25TopK: k truncates, unknown terms are ignored, scores are exact longs") {
    val top2 = Retrieval.bm25TopK(corpus, "doc_id", "text", terms, k = 2).collect()
    assert(top2.length == 2 && top2.map(_.getInt(3)).sorted.toSeq == Seq(1, 2))
    val withGhost = Retrieval.bm25TopK(corpus, "doc_id", "text",
      terms :+ "zzzznotaword", k = 10).collect()
    assert(withGhost.map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 5L))
    // determinism: two evaluations produce identical cells
    val a = Retrieval.bm25TopK(corpus, "doc_id", "text", terms, 10).collect().toSeq
    val b = Retrieval.bm25TopK(corpus, "doc_id", "text", terms, 10).collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq))
  }

  test("scoreAndRank over externally-supplied stats ≡ bm25TopK's own passes") {
    val s = spark
    import s.implicits._
    // derive df/N/T exactly as a maintained deployment would store them
    val toks = corpus.select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
    val nT = toks.agg(sum(size(col("w")).cast("long")), count(lit(1)))
      .as[(Long, Long)].head()
    val dfr = toks.select(col("doc_id"), explode(array_distinct(col("w"))).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val hits = toks.select(col("doc_id"), size(col("w")).cast("long").as("dl"),
        explode(col("w")).as("tok"))
      .filter(col("tok").isin(terms: _*))
    val tf = hits.groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
    val viaState = Retrieval.scoreAndRank(
      tf.join(broadcast(dfr), "tok")
        .withColumn("N_T", lit(nT._1)).withColumn("N_N", lit(nT._2)),
      "doc_id", 10).collect().map(_.toSeq).toSeq
    val direct = Retrieval.bm25TopK(corpus, "doc_id", "text", terms, 10)
      .collect().map(_.toSeq).toSeq
    assert(viaState == direct)
  }

  test("fixed-point range bound is enforced in-plan, not just documented") {
    val s = spark
    import s.implicits._
    // tf·N_T = 1e7 · 1e6 = 1e13 > MaxTfNt (~1.54e10, derived from the
    // table-max idf_fp = 13·2^20): past the 64-bit bound the numerator
    // would wrap and silently mis-rank — the guard must kill the job
    // instead (the repo's fail-loudly convention)
    assert(Retrieval.MaxTfNt == Long.MaxValue / (44L * 13L * (1L << 20)))
    val postings = Seq((1L, "spark", 10000000L, 10000000L, 1L, 1000000L, 100L))
      .toDF("doc_id", "tok", "tf", "dl", "df", "N_T", "N_N")
    val e = intercept[Exception] {
      Retrieval.scoreAndRank(postings, "doc_id", 5).collect()
    }
    val chain = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("fixed-point range bound"), chain)
    // just UNDER the bound scores normally
    val ok = Seq((1L, "spark", 1000L, 2000L, 1L, 1000000L, 100L))
      .toDF("doc_id", "tok", "tf", "dl", "df", "N_T", "N_N")
    assert(Retrieval.scoreAndRank(ok, "doc_id", 5).count() == 1)
  }
}
