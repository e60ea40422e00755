package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked text retrieval: Okapi BM25 (Robertson & Spärck Jones's probabilistic
  * weighting, the default lexical ranker in every search engine) over the
  * engine's shared tokenizer, plus the scoring core reused by the maintained
  * corpus-statistics composition (`q_bm25_maintain`).
  *
  * == Determinism (the oracle gate) ==
  *
  * BM25 is a sum of per-term floating products — order-dependent in IEEE
  * doubles and libm-dependent through its `ln`. Both hazards are removed by
  * fixed-point construction, the same recipe as the DSIR/LM scorers:
  *
  *  - IDF uses the Lucene-shaped always-positive form
  *    `log2(1 + (N − df + ½)/(df + ½)) = −log2((2·df+1)/(2·N+2))`: the
  *    inverse ratio is quantized to the [[QualityOps.QuantScale]] grid and
  *    mapped through the embedded [[QualityOps.fpLog2Table]] — no libm call
  *    in either engine, `idf_fp` is an exact integer ≥ 0.
  *  - The length-normalized tf factor `tf·(k1+1)/(tf + k1(1−b+b·dl/avgdl))`
  *    with the standard k1=1.2, b=0.75 is cleared of fractions by scaling
  *    numerator and denominator by `20·T` (T = total corpus tokens, so
  *    avgdl = T/N never materializes as a double):
  *    `term_fp = (idf_fp · 44·tf·T) div (20·tf·T + 6·T + 18·dl·N)` — one
  *    integer floor division per (doc, term).
  *  - `score_fp = Σ term_fp` is an exact long: partition order cannot move
  *    a single bit, and the rank tie-break is (score desc, doc_id asc).
  *
  * Long-range bound: `idf_fp·44·tf·T < 2^63` caps `tf·T` at ~1.54×10^10
  * (idf_fp ≤ 13·2^20, the log-table maximum at p = 2^-13). A 100 TB
  * corpus exceeds it in the raw encoding — there, route the same integers
  * through `decimal(38,0)` (exact in both engines) or pre-scale T; the
  * *shape* of the plan is unchanged.
  *
  * == Plan shape (the 100 TB story) ==
  *
  * Two linear passes over the corpus and only per-hit rows ever shuffle:
  * one column-pruned pass computes the corpus totals (N, T — one row,
  * broadcast back); one tokenize+explode pass is filtered to the query's
  * terms BEFORE any shuffle, so the (doc, term, tf, dl) relation carries
  * only matching postings. Document frequencies then come from that tiny
  * relation (one row per posting → `count` per term, broadcast), never from
  * a second corpus scan. Top-k is a rank-filter window that Spark 4
  * rewrites to partial+final WindowGroupLimit — per-partition heaps, no
  * global sort of the scored set. In a standing deployment N/T/df are
  * MAINTAINED state (see `Td.bm25StatsTables`): both corpus passes
  * disappear and query cost is ∝ postings of the query terms.
  */
object Retrieval {

  /** Largest tf·N_T the 64-bit fixed-point score arithmetic tolerates:
    * idf_fp·44·tf·N_T must stay under 2^63, with idf_fp bounded by the
    * TABLE MAXIMUM — the rarest-term bucket maps to p = 0.5/QuantScale =
    * 2^-13, so idf_fp ≤ 13·LogScale = 13·2^20 — giving
    * 2^63/(44·13·2^20) ≈ 1.54×10^10. DERIVED, not transcribed: the old
    * hand-written 6.5e12 figure was ~420× past the real wrap point, so
    * the in-plan guard could pass while the score wrapped (r9 ADVICE).
    */
  val MaxTfNt: Long = Long.MaxValue / (44L * 13L * QualityOps.LogScale)

  /** Fixed-point BM25 top-k for a bag of query `terms`.
    * Output: `(doc_id, n_terms, score_fp, rank)`, rank 1..k.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    require(k > 0, "k must be positive")
    // Pinned (localCheckpoint): toks has two consumers (corpus totals and
    // the posting explode), so unpinned the corpus would TOKENIZE TWICE —
    // and the explode's Generate-inferred size/isnotnull filters would
    // substitute the tokenizer chain into a Filter and run it 3× per row
    // (the r16 filter-pushdown blowup law, Generate-inferred variant —
    // PlanLint caught it on q_search_capstone, where textCol is itself a
    // derived htmlText chain). Tokenize once, scan the pinned (id, tokens)
    // relation from both branches. The maintained-stats path
    // (engine.RetrievalDelta + scoreAndRank) stays the no-corpus-pass
    // production shape; this is the ad-hoc one-shot.
    val toks = docs.select(col(idCol), TextOps.tokens(col(textCol)).as("__w"))
      .localCheckpoint()
    val totals = toks.agg(
      sum(size(col("__w")).cast("long")).as("N_T"),
      count(lit(1)).as("N_N"))
    val hits = toks
      .select(col(idCol), size(col("__w")).cast("long").as("dl"),
        explode(col("__w")).as("tok"))
      .filter(col("tok").isin(terms: _*))
    val tf = hits.groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    // one row per posting already — df is a count, not a countDistinct
    val dfr = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    scoreAndRank(tf.join(broadcast(dfr), "tok").crossJoin(broadcast(totals)),
      idCol, k)
  }

  /** The scoring tail shared with the maintained-stats path: input must
    * carry `(idCol, tok, tf, dl, df, N_T, N_N)`; emits the ranked top-k.
    */
  def scoreAndRank(postings: DataFrame, idCol: String, k: Int): DataFrame = {
    val logTab = typedLit(QualityOps.fpLog2Table.toSeq)
    val q = QualityOps.QuantScale
    val scored = postings
      .withColumn("__qinv", expr(s"((2 * df + 1) * $q) div (2 * N_N + 2)"))
      .withColumn("__idf_fp", -element_at(logTab, col("__qinv").cast("int") + 1))
      // The scaladoc's long-range bound, ENFORCED in-plan (the repo's
      // fail-loudly convention — compare RetrievalDelta's duplicate-seq
      // raise_error): past tf·N_T ≈ 1.54e10 the integer numerator
      // idf_fp·44·tf·N_T can wrap and silently mis-rank. The comparison runs
      // in decimal so the GUARD itself cannot wrap; the hot path stays
      // integer. Real corpora sit orders of magnitude below the bound —
      // crossing it means score sharding is needed, not a bigger wrap.
      .withColumn("__fp_ok",
        when(col("tf").cast("decimal(38,0)") * col("N_T") <= lit(MaxTfNt), lit(true))
          .otherwise(raise_error(concat(
            lit(s"Retrieval: tf*N_T exceeds the fixed-point range bound $MaxTfNt "),
            lit("(64-bit score arithmetic would wrap and mis-rank) for doc "),
            col(idCol).cast("string")))))
      .filter(col("__fp_ok"))
      .withColumn("__term_fp",
        expr("(__idf_fp * (44 * tf * N_T)) div (20 * tf * N_T + 6 * N_T + 18 * dl * N_N)"))
      .groupBy(col(idCol))
      .agg(sum(col("__term_fp")).as("score_fp"), count(lit(1)).as("n_terms"))
    val w = Window.orderBy(col("score_fp").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("n_terms"), col("score_fp"), col("rank"))
  }
}
