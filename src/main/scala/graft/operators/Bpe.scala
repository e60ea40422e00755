package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge TRAINING (Sennrich, Haddow & Birch, ACL'16
  * "Neural Machine Translation of Rare Words with Subword Units") — the
  * real thing, not the pre-token count heuristic (`TextOps.bpeTokenCount`
  * remains the cheap estimator).
  *
  * Scale shape — the part that matters at 100 TB: training never iterates
  * over the corpus. One corpus scan aggregates to the WORD-FREQUENCY
  * table (vocabulary-bounded — Heaps' law puts it in the millions of rows
  * for a 100 TB corpus, i.e. executor-trivial), and every merge iteration
  * is (pair-explode → sum → argmax) + (one string replace) over that
  * table only. The argmax collects exactly ONE row per iteration (bounded
  * metadata, same license as the IVF centroid collects,
  * Similarity.scala:452). Applying a learned merge table to the corpus is
  * a per-row expression chain — zero shuffle, scan speed.
  *
  * Representation: a word is its symbol sequence with each symbol
  * paren-wrapped ("low" → "(l)(o)(w)(</w>)", `</w>` the terminal marker).
  * Parens appear ONLY as delimiters (tokens are `\p{L}`/`\p{Nd}` runs by
  * `TextOps.normText` — parens can never survive normalization), so
  * `replace(sym, '(a)(b)', '(ab)')` can match
  * only whole adjacent symbols, and — because adjacent matches share no
  * characters — its leftmost non-overlapping semantics are exactly BPE's
  * greedy merge pass: "(a)(a)(a)" + merge(a,a) → "(aa)(a)", and
  * back-to-back runs fully merge, "(q)(q)(q)(q)" → "(qq)(qq)". (A
  * space-JOINED form is subtly wrong here: replacing " a b " consumes
  * the shared trailing delimiter, so the second pair of a run no longer
  * has its leading space and survives unmerged — caught by the
  * BpeCount-kernel equivalence spec.)
  *
  * Determinism: argmax ties break on the pair string ascending; counts
  * are exact longs — bit-identical across engines, retries and partition
  * layouts. The DuckDB oracle RE-TRAINS from scratch as one unrolled CTE
  * chain (the PageRank shared-constants pattern, Graph.scala) — a wrong
  * tie-break, a missed merged-symbol pair or an overlap bug diverges the
  * merge table and hash-fails.
  */
object Bpe {

  val EndMark = "</w>"

  /** A learned merge: `pair` is "left right", `merged` the fused symbol. */
  final case class Merge(step: Int, pair: String, merged: String, pairCount: Long)

  // The representation's ONLY structural requirement: symbols must not
  // contain the paren delimiters (then "(a)(b)" literal replace can match
  // whole adjacent symbols and nothing else). TextOps.tokens guarantees it
  // (parens are stripped by normalization). The old ASCII whitelist
  // ([a-z0-9</>w ]) predates the Unicode tokenizer and would reject every
  // non-Latin merge pair — training on a multilingual corpus threw on its
  // first Cyrillic/CJK argmax (r10).
  private val SymbolOk = "^[^()]+$".r

  /** Word-frequency table (word, cnt) → paren-wrapped symbol form
    * (sym, cnt), e.g. "(l)(o)(w)(</w>)". ONE corpus scan; everything
    * after is vocabulary-bounded.
    */
  def wordTable(docs: DataFrame, textCol: Column): DataFrame =
    docs.filter(textCol.isNotNull)
      .select(explode(TextOps.tokens(textCol)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(
        concat(regexp_replace(col("word"), "(.)", "($1)"), lit(s"($EndMark)")).as("sym"),
        col("cnt"))

  /** Symbol list of a paren-wrapped column: strip the outer parens, split
    * on the ")(" seams.
    */
  private def symbolsOf(sym: Column): Column =
    split(sym.substr(lit(2), length(sym) - 2), "[)][(]")

  /** Adjacent-pair counts over the symbol table, weighted by word count.
    * Pair display form is "left right" (space-joined) — symbols never
    * contain spaces, so it splits back losslessly.
    */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      .select(symbolsOf(col("sym")).as("s"), col("cnt"))
      .select(explode(zip_with(
        slice(col("s"), lit(1), size(col("s")) - 1),
        slice(col("s"), lit(2), size(col("s")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("pair"), col("cnt"))
      .groupBy("pair").agg(sum("cnt").as("c"))

  /** One greedy merge pass: every non-overlapping leftmost occurrence of
    * "(a)(b)" fuses into "(ab)". Adjacent matches share no characters, so
    * back-to-back runs fully merge — see the representation note above.
    */
  private def applyMergeCol(sym: Column, pair: String, merged: String): Column = {
    require(SymbolOk.findFirstIn(pair).isDefined, s"unsafe merge pair '$pair'")
    val Array(a, b) = pair.split(" ", 2)
    replace(sym, lit(s"($a)($b)"), lit(s"($merged)"))
  }

  /** Learn `nMerges` merges from the corpus. Returns the merge list; the
    * driver loop runs `nMerges` vocabulary-bounded jobs, each collecting
    * one argmax row. Stops early if no pair remains (tiny corpora).
    */
  def train(docs: DataFrame, textCol: Column, nMerges: Int): Seq[Merge] = {
    require(nMerges > 0, "nMerges must be positive")
    // The corpus scan happens once: pin the word table, then every
    // iteration replans only vocabulary-sized work on top of it.
    var words = wordTable(docs, textCol).localCheckpoint()
    val out = Seq.newBuilder[Merge]
    var step = 0
    var exhausted = false
    while (step < nMerges && !exhausted) {
      val best = pairCounts(words)
        .orderBy(col("c").desc, col("pair").asc).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val pair = best(0).getString(0)
        val merged = pair.replace(" ", "")
        out += Merge(step, pair, merged, best(0).getLong(1))
        words = words
          .select(applyMergeCol(col("sym"), pair, merged).as("sym"), col("cnt"))
          .localCheckpoint()
        step += 1
      }
    }
    out.result()
  }

  /** The learned merge table as a DataFrame (query/report surface). */
  def mergeTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF("step", "pair", "merged", "pair_count")
  }

  /** Merge list as (left, right) symbol pairs — the kernels' input form. */
  def pairsOf(merges: Seq[Merge]): Seq[(String, String)] =
    merges.map { m =>
      val p = m.pair.split(" ", 2)
      (p(0), p(1))
    }

  /** Segment one word-symbol-string column through the merge list in
    * training order — the tokenizer's encode step, as a per-row
    * expression chain (no shuffle, no UDF).
    */
  def applyMerges(sym: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(sym) { (c, m) => applyMergeCol(c, m.pair, m.merged) }

  /** Per-document subword statistics under a learned merge list:
    * (doc_id, n_tokens, n_subwords). Whole-corpus pass, zero shuffle,
    * via the [[graft.functions.BpeCount]] codegen kernel — one tight
    * loop per row instead of O(merges) interpreted string replaces per
    * word (the HOF twin below stays as the equivalence gate).
    */
  def tokenize(docs: DataFrame, idCol: String, textCol: Column,
               merges: Seq[Merge]): DataFrame = {
    val words = filter(TextOps.tokens(textCol), w => length(w) > 0)
    docs.filter(textCol.isNotNull).select(
      col(idCol),
      size(words).cast("long").as("n_tokens"),
      graft.functions.BpeKernels.bpe_count(words, pairsOf(merges))
        .as("n_subwords"))
  }

  /** The pure-expression twin of [[tokenize]] (HOF transform + the
    * replace chain) — semantics reference for the kernel, spec-pinned
    * equal on arbitrary corpora.
    */
  def tokenizeExpr(docs: DataFrame, idCol: String, textCol: Column,
                   merges: Seq[Merge]): DataFrame = {
    val words = filter(TextOps.tokens(textCol), w => length(w) > 0)
    val syms = transform(words, w =>
      applyMerges(concat(regexp_replace(w, "(.)", "($1)"), lit(s"($EndMark)")), merges))
    // n symbols == n opening parens: length minus length-without-'('
    val nSub = aggregate(syms, lit(0L),
      (acc, s) => acc + (length(s) - length(replace(s, lit("("), lit("")))).cast("long"))
    docs.filter(textCol.isNotNull).select(
      col(idCol),
      size(words).cast("long").as("n_tokens"),
      nSub.as("n_subwords"))
  }
}
