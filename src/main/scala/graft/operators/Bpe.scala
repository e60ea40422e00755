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

  // --- Unigram-LM tokenizer training (Kudo, ACL'18) -----------------------

  /** Radix for the SQL twin's combined (cost, start) Viterbi encoding —
    * words must stay under this many codepoints (enforced fail-early in
    * [[trainUnigram]]); real tokens sit orders of magnitude below.
    */
  val UnigramMaxWordLen = 1024

  /** Unigram-LM tokenizer TRAINING (Kudo, "Subword Regularization", ACL'18
    * §3) as deterministic fixed-point hard-EM, the last member of the
    * tokenizer family beside [[train]] (BPE). Semantics, exactly:
    *
    *  1. SEED: every ≤ `maxPieceLen`-codepoint substring of every word,
    *     weighted by word frequency; keep the top `seedSize` by
    *     (count desc, piece asc) plus ALL single-codepoint pieces (they
    *     guarantee every word segments).
    *  2. E-STEP (hard): Viterbi min-cost segmentation of each distinct
    *     word under the current integer cost table
    *     ([[graft.functions.UnigramTable.segment]] — ties to the longest
    *     piece), pieces counted weighted by word frequency.
    *  3. M-STEP: cost(p) = −fpLog2[((c+1)·QuantScale) div (N+V)] — NB's
    *     add-one fixed-point grid ([[TextOps.trainHashNb]]), so costs are
    *     integers both engines derive bit-identically; no libm.
    *  4. PRUNE after the first E-step: keep pieces with count ≥ `minCount`
    *     plus all singles; re-estimate; run the second E-step and a final
    *     M-step over the pruned vocabulary.
    *
    * Hard-EM (Viterbi counts, not forward–backward expectations) is the
    * published deterministic variant — soft EM's float lattice sums cannot
    * hash-pin cross-engine; every arithmetic here is 64-bit integer.
    *
    * Scale shape: the corpus is touched ONCE (the word-frequency
    * aggregate — the same Heaps-bounded relation BPE trains on); seed
    * counting explodes ≤ maxPieceLen substrings per word position of the
    * DISTINCT-word table; top-K seeding is a distributed
    * TakeOrderedAndProject, never a single-partition rank; each E-step is
    * one codegen kernel pass over the word table + a vocab-sized count.
    * Driver-side state is the piece table (≤ seedSize + alphabet rows) —
    * the word2phrase broadcast-table contract.
    *
    * Returns the final model: (piece, count, cost), `keep`-sorted.
    */
  def trainUnigram(docs: DataFrame, textCol: Column,
                   maxPieceLen: Int = 4, seedSize: Int = 2048,
                   minCount: Long = 2L): Seq[(String, Long, Long)] = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(seedSize >= 1, s"seedSize must be >= 1, got $seedSize")
    require(minCount >= 0, s"minCount must be >= 0, got $minCount")
    val words = docs.select(explode(TextOps.tokens(textCol)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // fail-early on an empty corpus (ADVICE r17): max() over zero rows is
    // NULL and a bare getInt would throw an opaque NullPointerException
    val maxLenRow = words.agg(max(length(col("w")))).collect()(0)
    require(!maxLenRow.isNullAt(0),
      "trainUnigram: the input corpus tokenized to zero words — nothing to train on")
    val maxLen = maxLenRow.getInt(0)
    require(maxLen < UnigramMaxWordLen,
      s"trainUnigram: a token has $maxLen codepoints (>= $UnigramMaxWordLen); " +
        "the oracle's combined Viterbi encoding needs words under the radix — split upstream")
    // substrings, codepoint-indexed (Spark substring/length and DuckDB
    // substring/length both count codepoints)
    val sub = words
      .select(col("w"), col("cnt"), length(col("w")).cast("long").as("n"))
      .filter(col("n") > 0)
      .select(col("w"), col("cnt"), col("n"),
        explode(sequence(lit(0L), col("n") - 1)).as("i"))
      .select(col("w"), col("cnt"), col("i"),
        explode(sequence(lit(1L), least(lit(maxPieceLen.toLong), col("n") - col("i")))).as("l"))
      .select(expr("substring(w, CAST(i + 1 AS INT), CAST(l AS INT))").as("piece"), col("cnt"))
    val c0 = sub.groupBy("piece").agg(sum("cnt").as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seed = c0.orderBy(col("c").desc, col("piece").asc).limit(seedSize)
      .union(c0.filter(length(col("piece")) === 1)).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    c0.unpersist()
    val vocab0 = costsOf(seed)
    val c1 = emCounts(words, vocab0, maxPieceLen)
    val singles = seed.collect { case (p, _) if p.codePointCount(0, p.length) == 1 => p }.toSet
    val keep = (c1.filter(_._2 >= minCount).keySet ++ singles).toSeq.sorted
    val vocab1 = costsOf(keep.map(p => (p, c1.getOrElse(p, 0L))))
    val c2 = emCounts(words, vocab1, maxPieceLen)
    words.unpersist()
    val n2 = keep.iterator.map(p => c2.getOrElse(p, 0L)).sum
    keep.map { p =>
      val c = c2.getOrElse(p, 0L)
      (p, c, unigramCost(c, n2, keep.length.toLong))
    }
  }

  /** The M-step arithmetic — shared by every estimation point so the three
    * cost tables (seed, pruned, final) can never drift from the generated
    * oracle's. Scala `/` on non-negative longs is floor division, matching
    * Spark `div` and DuckDB `//`.
    */
  private def unigramCost(c: Long, n: Long, v: Long): Long =
    -QualityOps.fpLog2Table((((c + 1) * QualityOps.QuantScale) / (n + v)).toInt)

  private def costsOf(counts: Seq[(String, Long)]): Seq[(String, Long)] = {
    val n = counts.iterator.map(_._2).sum
    val v = counts.length.toLong
    counts.map { case (p, c) => (p, unigramCost(c, n, v)) }
  }

  /** One hard-EM E-step: Viterbi counts over the distinct-word table,
    * weighted by word frequency. One kernel pass + a vocab-sized count.
    */
  private def emCounts(words: DataFrame, vocab: Seq[(String, Long)], maxPieceLen: Int): Map[String, Long] =
    words.select(
        explode(graft.functions.BpeKernels.unigram_segment(col("w"), vocab, maxPieceLen)).as("piece"),
        col("cnt"))
      .groupBy("piece").agg(sum("cnt").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** The learned unigram model as a DataFrame (query/report surface). */
  def unigramTable(spark: SparkSession, model: Seq[(String, Long, Long)]): DataFrame = {
    import spark.implicits._
    model.toDF("piece", "cnt", "cost")
  }

  /** Per-document unigram-LM segmentation stats under a learned model:
    * (doc_id, n_pieces, pieces_fp) — the fingerprint pins every piece
    * boundary of every token in document order (one drifted Viterbi
    * tie-break anywhere moves it). One kernel pass per token occurrence,
    * zero shuffle before the per-doc rollup.
    */
  def unigramTokenize(docs: DataFrame, idCol: String, textCol: Column,
                      model: Seq[(String, Long, Long)], maxPieceLen: Int): DataFrame = {
    val vocab = model.map(t => (t._1, t._3))
    docs.select(col(idCol), posexplode(TextOps.tokens(textCol)).as(Seq("__pos", "__w")))
      .select(col(idCol),
        graft.functions.BpeKernels.unigram_segment(col("__w"), vocab, maxPieceLen).as("__p"),
        col("__pos"))
      .select(col(idCol), size(col("__p")).cast("long").as("__np"),
        struct(col("__pos"), array_join(col("__p"), " ").as("ps")).as("__x"))
      .groupBy(col(idCol))
      .agg(sum(col("__np")).as("n_pieces"),
        TextOps.polyHash(array_join(
          transform(sort_array(collect_list(col("__x"))), x => x.getField("ps")),
          " ")).as("pieces_fp"))
  }
}
