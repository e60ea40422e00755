package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Precompiled BPE merge table for the segmentation kernels — the merge
  * list flattened into parallel arrays once per JVM (codegen reference
  * object), so the per-word loop touches no Scala collections.
  *
  * Semantics contract: SEQUENTIAL rank-order application — merge 0 runs to
  * completion (one greedy leftmost non-overlapping pass), then merge 1, …
  * This is bit-identical to [[graft.operators.Bpe.applyMerges]]' replace
  * chain and to the DuckDB oracle's nested-replace form. (The
  * priority-queue variant GPT-2's encoder uses can differ on tables where
  * two merges produce the same symbol string — e.g. (a,bc) and (ab,c) both
  * yielding "abc" — because a late merge can create an occurrence of an
  * earlier merge's pair. This repo pins the sequential semantics everywhere
  * so the kernel, the expression chain and the oracle cannot drift.)
  */
final class BpeMergeTable(pairs: Array[(String, String)]) extends Serializable {
  private val la: Array[String] = pairs.map(_._1)
  private val rb: Array[String] = pairs.map(_._2)
  private val merged: Array[String] = pairs.map(p => p._1 + p._2)
  val nMerges: Int = pairs.length

  /** Segment one word (chars + terminal marker), returning the symbol
    * array after all merges. `buf` is caller-provided scratch ≥ chars+1.
    */
  private def segmentInto(word: String, buf: Array[String]): Int = {
    // code-point symbols, not UTF-16 units — Java regex `(.)` (the
    // expression chain's char splitter) matches full code points, and the
    // kernel must agree on astral-plane input
    var n = 0
    var i = 0
    while (i < word.length) {
      val cc = Character.charCount(word.codePointAt(i))
      buf(n) = word.substring(i, i + cc)
      i += cc; n += 1
    }
    buf(n) = graft.operators.Bpe.EndMark
    n += 1
    var k = 0
    while (k < nMerges) {
      val a = la(k); val b = rb(k); val m = merged(k)
      var out = 0
      i = 0
      while (i < n) {
        if (i + 1 < n && buf(i) == a && buf(i + 1) == b) {
          buf(out) = m; i += 2
        } else {
          buf(out) = buf(i); i += 1
        }
        out += 1
      }
      n = out
      k += 1
    }
    n
  }

  def segment(word: String): Array[String] = {
    val buf = new Array[String](word.length + 1)
    val n = segmentInto(word, buf)
    java.util.Arrays.copyOf(buf, n)
  }

  /** Total subword count across a token array (skipping empty tokens, the
    * same filter the expression chain applies). Null elements count 0 —
    * `TextOps.tokens` never yields them, but the kernel must not NPE on
    * hand-built arrays.
    */
  def countWords(words: ArrayData): Long = {
    val nw = words.numElements()
    var buf = new Array[String](16)
    var total = 0L
    var w = 0
    while (w < nw) {
      if (!words.isNullAt(w)) {
        val s = words.getUTF8String(w).toString
        if (s.nonEmpty) {
          if (s.length + 1 > buf.length) buf = new Array[String](s.length + 1)
          total += segmentInto(s, buf)
        }
      }
      w += 1
    }
    total
  }

  def segmentArray(word: UTF8String): ArrayData = {
    val subs = segment(word.toString)
    new GenericArrayData(subs.map(s => UTF8String.fromString(s): Any))
  }
}

/** Total subword count over an array<string> of words under a fixed merge
  * table — replaces `aggregate(transform(words, chain-of-replaces), …)`:
  * the interpreted HOF pair costs O(merges) string allocations per word;
  * this is one tight loop inside whole-stage codegen.
  */
case class BpeCount(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType

  @transient private lazy val table = new BpeMergeTable(merges.toArray)

  override def nullSafeEval(input: Any): Any =
    table.countWords(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", table, classOf[BpeMergeTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countWords($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}

/** Subword segmentation of one word column under a fixed merge table —
  * returns array<string> of symbols (chars + `</w>` fused by the merges).
  */
case class BpeSegment(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val table = new BpeMergeTable(merges.toArray)

  override def nullSafeEval(input: Any): Any =
    table.segmentArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", table, classOf[BpeMergeTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.segmentArray($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeSegment =
    copy(child = newChild)
}

/** Precompiled unigram-LM piece table: piece → integer Viterbi cost
  * (−fixed-point-log2 probability). Rides the plan as a codegen reference
  * object; probes hash UTF8String piece slices built once per (i, j).
  */
final class UnigramTable(vocab: Array[(String, Long)], val maxPieceLen: Int) extends Serializable {
  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
  @transient private lazy val costs: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](vocab.length * 2)
    vocab.foreach { case (p, c) => m.put(UTF8String.fromString(p), java.lang.Long.valueOf(c)) }
    m
  }

  /** Fallback cost for a character with no vocab entry — see
    * [[graft.operators.QualityOps.UnigramUnkCost]] (one definition, shared
    * with the generated oracle SQL).
    */
  val UnkCost: Long = graft.operators.QualityOps.UnigramUnkCost

  /** Viterbi min-cost segmentation over CODE POINTS (DuckDB slices
    * characters, so the DP index space must be codepoints, not UTF-16
    * units). Tie-break: at equal path cost the SMALLEST piece start index
    * wins (the longest piece) — iterate starts ascending with a strict
    * `<` update; the SQL twin encodes (cost·R + i) and takes list_min, the
    * same total order. Empty word → empty array.
    */
  def segment(word: UTF8String): ArrayData = {
    val cps = word.toString.codePoints.toArray
    val n = cps.length
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val best = new Array[Long](n + 1)
    val bp = new Array[Int](n + 1)
    var j = 1
    while (j <= n) {
      var bj = Long.MaxValue
      var bi = -1
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        val c = costs.get(UTF8String.fromString(new String(cps, i, j - i)))
        if (c != null) {
          val cand = best(i) + c.longValue
          if (cand < bj) { bj = cand; bi = i }
        }
        i += 1
      }
      if (bi < 0) { bj = best(j - 1) + UnkCost; bi = j - 1 } // unknown char
      best(j) = bj
      bp(j) = bi
      j += 1
    }
    var out = List.empty[Any]
    var p = n
    while (p > 0) {
      out = UTF8String.fromString(new String(cps, bp(p), p - bp(p))) :: out
      p = bp(p)
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** Viterbi unigram-LM segmentation of one word column under a fixed piece
  * cost table (Kudo, ACL'18 — the inference half; [[graft.operators.Bpe
  * .trainUnigram]] learns the table). Returns array<string> of pieces.
  */
case class UnigramSegment(child: Expression, vocab: Seq[(String, Long)], maxPieceLen: Int)
  extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val table = new UnigramTable(vocab.toArray, maxPieceLen)

  override def nullSafeEval(input: Any): Any =
    table.segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", table, classOf[UnigramTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.segment($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}

object BpeKernels {
  def bpe_count(words: Column, merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(BpeCount(GraftColumnBridge.expression(words), merges))
  def bpe_segment(word: Column, merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(BpeSegment(GraftColumnBridge.expression(word), merges))
  def unigram_segment(word: Column, vocab: Seq[(String, Long)], maxPieceLen: Int): Column =
    GraftColumnBridge.column(UnigramSegment(GraftColumnBridge.expression(word), vocab, maxPieceLen))
}
