package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hot-path kernels as native Catalyst expressions with `doGenCode` — the
  * interpreted higher-order-function equivalents (`aggregate(zip_with(...))`,
  * char-fold `aggregate(split(...))`) cost microseconds per element and
  * dominate wall-time on pairwise workloads; these compile to a tight loop
  * inside whole-stage codegen.
  *
  * Semantics are kept bit-identical to the HOF formulations (and the DuckDB
  * oracle): see each kernel's doc.
  */
object Kernels {

  /** The polynomial-hash modulus — ONE definition for the unigram fold, the
    * bigram continuation, and (via `TextOps.HashP`) the generated oracle
    * SQL, so the three can never drift apart.
    */
  val HashP = 1000000007L

  /** Static helpers the generated code calls — one JVM-static call per row,
    * loop runs in plain Java.
    */
  def polyHash(s: UTF8String): Long = {
    // Folds Unicode CODE POINTS, not UTF-16 units: DuckDB's oracle twin
    // (`unicode(c)`/`ascii(c)` over a per-character split) is codepoint-
    // based, so a UTF-16 fold would silently diverge on any astral-plane
    // character (emoji, Gothic, CJK ext B) — r9 verdict #2. Max codepoint
    // 0x10FFFF keeps every intermediate < 2^35. Multi-part strings (the
    // bigram "a b") continue the fold via the affine identity
    // fold(h0, s) = (h0 · 31^cps(s) + fold(0, s)) mod P — see [[hashScore]],
    // which tracks 31^cps inline; a separate h0-continuation entry point
    // had no caller (ADVICE r15) and was dropped.
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % HashP
      i += Character.charCount(cp)
    }
    h
  }

  /** Hashed bag-of-features linear score (fastText-style inference, Joulin
    * et al. 2016): Σ weights(polyHash(feature) mod weights.length) over the
    * token array's UNIGRAMS plus its adjacent word BIGRAMS (wordNgrams=2).
    * A bigram "a b" hashes as polyHash(a || ' ' || b) WITHOUT building the
    * joined string, via the affine fold identity
    * fold(h0, s) = (h0 · 31^cps(s) + fold(0, s)) mod P — the unigram pass
    * tracks 31^cps alongside the hash, so each token is decoded and folded
    * exactly ONCE per row (one toString, one codepoint loop) and nothing
    * allocates per feature. Both factors are < P ≈ 10^9, so the product
    * stays under 2^63. A null token element nulls the whole score (boxed
    * return), matching the HOF fold a `list_sum` twin would compute.
    */
  def hashScore(arr: ArrayData, weights: Array[Long]): java.lang.Long = {
    val n = arr.numElements()
    val m = weights.length
    var acc = 0L
    var prev = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val str = arr.getUTF8String(i).toString
      var h = 0L
      var pw = 1L // 31^(codepoints folded so far) mod P
      var j = 0
      while (j < str.length) {
        val cp = str.codePointAt(j)
        h = (h * 31 + cp) % HashP
        pw = (pw * 31) % HashP
        j += Character.charCount(cp)
      }
      acc += weights((h % m).toInt)
      if (i > 0) {
        val hb0 = (prev * 31 + 32) % HashP // fold state after "prev "
        acc += weights(((((hb0 * pw) % HashP) + h) % HashP % m).toInt)
      }
      prev = h
      i += 1
    }
    acc
  }

  /** Equal-length dot; callers guard the length check (mismatch → null, the
    * same as zip_with's null-padding nulling the whole fold). A null ELEMENT
    * also nulls the result (boxed return) — matching the HOF fold, where a
    * null product nulls the running sum; the per-element bitmap check is a
    * bit read, invisible next to the multiply.
    */
  def floatDotSameLen(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += (a.getFloat(i) * b.getFloat(i)).toDouble // float multiply, double accumulate
      i += 1
    }
    acc
  }

  def vocabCount(arr: ArrayData, vocab: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && vocab.contains(arr.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  private val Underscore = UTF8String.fromString("_")

  /** Greedy left-to-right phrase merge — the APPLICATION half of word2vec's
    * phrase induction (Mikolov et al. 2013 §4, word2phrase): walk the token
    * array once; when the adjacent pair (t[i], t[i+1]) is in the mined
    * phrase table, emit the joined token "t[i]_t[i+1]" and consume BOTH
    * (greedy — the consumed token cannot start another phrase), else emit
    * t[i]. '_' never occurs in tokenizer output (the tokenizer splits on
    * non-letter/digit), so merged tokens are unambiguous downstream.
    *
    * The table is two-level (first word → set of second words) so the probe
    * allocates nothing: both lookups hash UTF8String slices of the input
    * array; only an actual merge builds a new string. A null element nulls
    * the whole result (boxed), matching the engine's other array kernels.
    */
  def phraseMerge(arr: ArrayData,
                  table: java.util.HashMap[UTF8String, java.util.HashSet[UTF8String]]): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val t = arr.getUTF8String(i)
      var merged = false
      if (i + 1 < n && !arr.isNullAt(i + 1)) {
        val seconds = table.get(t)
        if (seconds != null && seconds.contains(arr.getUTF8String(i + 1))) {
          out.add(UTF8String.concat(t, Underscore, arr.getUTF8String(i + 1)))
          merged = true
        }
      }
      if (merged) i += 2 else { out.add(t); i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Stride-1 window fingerprints over a token array — the candidate pass of
    * substring-level exact dedup ([[graft.operators.Dedup.substringSpans]]).
    * Window i (0-based, i ∈ [0, n−k]) fingerprints tokens [i, i+k) as the
    * polynomial fold over the PER-TOKEN [[polyHash]]es:
    * fp_i = Σ_j th[i+j]·31^(k−1−j) mod P — the same (acc·31 + x) mod P
    * recurrence the engine uses everywhere, lifted from codepoints to token
    * hashes so the window fold is O(k) not O(window chars).
    *
    * Computed as a ROLLING hash: each token is decoded and hashed exactly
    * once (O(n) polyHash calls), then
    * fp_{i+1} = ((fp_i − th[i]·31^{k−1}) · 31 + th[i+k]) mod P — O(1) per
    * window, O(n) total, versus O(n·k) for the direct per-window fold. The
    * two are the same residue by the fold's affine structure, so the DuckDB
    * oracle can recompute each window DIRECTLY (list_reduce over a slice of
    * the token-hash list) and still match bit-for-bit. All intermediates
    * stay under 2^63: th, fp, 31^{k−1} are < P ≈ 10^9, products < 10^18.
    *
    * n < k ⇒ empty array (no window reaches k tokens); a null element nulls
    * the whole result (boxed), matching the engine's other array kernels.
    */
  def windowFps(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      th(i) = polyHash(arr.getUTF8String(i))
      i += 1
    }
    var pk = 1L // 31^(k-1) mod P
    i = 1
    while (i < k) { pk = (pk * 31) % HashP; i += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = (h * 31 + th(i)) % HashP; i += 1 }
    out(0) = h
    i = 1
    while (i <= n - k) {
      h = (((h - (th(i - 1) * pk) % HashP + HashP) % HashP) * 31 + th(i + k - 1)) % HashP
      out(i) = h
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** One-pass simhash fold over a token-hash array: per hash, bit b of the
    * signature gains +1 if the hash's bit b is set else -1; signature bit b
    * is set iff its counter ends positive. Matches the 30-fold interpreted
    * HOF formulation bit-for-bit (a null element contributes -1 to every
    * counter — `CASE WHEN (null & 1) = 1` takes the ELSE branch) while
    * touching each hash once instead of once per bit.
    */
  def simhashFold(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var b = 0
        while (b < bits) { counts(b) -= 1; b += 1 }
      } else {
        val h = arr.getLong(i)
        var b = 0
        while (b < bits) {
          if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) { if (counts(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }

  /** One-pass Unicode tokenizer — bit-identical to
    * `split(TextOps.normText(c), " ")` (lower → strip non-`\p{L}`/`\p{Nd}`
    * → per-char CJK split → collapse → trim → split), which remains the
    * spec-pinned semantics reference and the DuckDB oracle's form. The
    * regex chain rewrites the string three times and splits a fourth;
    * this is one whole-string lowercase plus one codepoint loop.
    *
    * Edge contract mirrored exactly: text with NO tokens (empty,
    * whitespace, punctuation-only) returns `[""]` — `split("", " ")`
    * yields one empty element on both engines, and `size(tokens)` of 1
    * for empty docs is baked into the oracle battery.
    */
  def normTokens(s: UTF8String): ArrayData = {
    // PER-CODEPOINT simple lowercase (Character.toLowerCase), matching
    // Spark 4's `lower` on UTF8_BINARY (codepoint-wise, NOT the contextual
    // java.lang.String.toLowerCase — Spark maps a word-final Σ to σ where
    // String.toLowerCase picks final ς; NormTokensFuzzSpec caught the
    // mismatch) and DuckDB's utf8proc simple mapping — one case contract
    // across all three evaluators, shared with Dedup.shingleSet
    val str = s.toString
    val toks = new java.util.ArrayList[Any](16)
    val sb = new java.lang.StringBuilder(16)
    def flush(): Unit = if (sb.length > 0) { toks.add(UTF8String.fromString(sb.toString)); sb.setLength(0) }
    var i = 0
    while (i < str.length) {
      val cp0 = str.codePointAt(i)
      i += Character.charCount(cp0)
      if (cp0 < 128) {
        var c = cp0.toChar
        if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
        if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
        else flush()
      } else {
        val cp = Character.toLowerCase(cp0)
        if ((cp >= 0x3040 && cp <= 0x30FF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
            (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0xAC00 && cp <= 0xD7AF)) {
          flush()
          toks.add(UTF8String.fromString(new String(Character.toChars(cp))))
        } else if (Character.isLetter(cp) || Character.isDigit(cp)) {
          sb.appendCodePoint(cp)
        } else flush()
      }
    }
    flush()
    if (toks.isEmpty) toks.add(UTF8String.fromString(""))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(toks.toArray)
  }

  /** Column wrappers. */
  def poly_hash(c: Column): Column = GraftColumnBridge.column(PolyHash(GraftColumnBridge.expression(c)))
  def float_dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(FloatDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def vocab_count(c: Column, vocab: Seq[String]): Column =
    GraftColumnBridge.column(VocabCount(GraftColumnBridge.expression(c), vocab))
  def norm_tokens(c: Column): Column =
    GraftColumnBridge.column(NormTokens(GraftColumnBridge.expression(c)))
  def simhash_fold(c: Column, bits: Int): Column =
    GraftColumnBridge.column(SimHashFold(GraftColumnBridge.expression(c), bits))
  def hash_score(c: Column, weights: Seq[Long]): Column =
    GraftColumnBridge.column(HashScore(GraftColumnBridge.expression(c), weights))
  def phrase_merge(c: Column, phrases: Seq[(String, String)]): Column =
    GraftColumnBridge.column(PhraseMerge(GraftColumnBridge.expression(c), phrases))
  def window_fps(c: Column, k: Int): Column =
    GraftColumnBridge.column(WindowFps(GraftColumnBridge.expression(c), k))
}

/** See [[Kernels.windowFps]]; `child` is an array<string> of tokens, output
  * array<long> of the n−k+1 stride-1 window fingerprints (empty when n < k).
  */
case class WindowFps(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"windowFps needs k >= 1, got $k")
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Kernels.windowFps(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("graftWindowFps")
      s"""
      org.apache.spark.sql.catalyst.util.ArrayData $r =
        graft.functions.Kernels.windowFps($c, $k);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $r; }"""
    })
  override protected def withNewChildInternal(newChild: Expression): WindowFps = copy(child = newChild)
}

/** See [[Kernels.simhashFold]]; `child` is an array<long> of token hashes. */
case class SimHashFold(child: Expression, bits: Int)
  extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Kernels.simhashFold(input.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.simhashFold($c, $bits)")
  override protected def withNewChildInternal(newChild: Expression): SimHashFold =
    copy(child = newChild)
}

/** See [[Kernels.normTokens]]; returns array<string> of normalized tokens. */
case class NormTokens(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Kernels.normTokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.normTokens($c)")
  override protected def withNewChildInternal(newChild: Expression): NormTokens =
    copy(child = newChild)
}

/** Polynomial rolling string hash: fold(code POINTS, h = (h*31 + c) mod
  * 1e9+7). Matches DuckDB's `list_reduce([ascii(c) for c in split(s,'')],…)`
  * twin exactly: both engines' per-character split yields whole code points
  * (DuckDB splits UTF-8 characters; Java regex refuses to split surrogate
  * pairs), and `ascii`/`unicode` of a one-character string is its code
  * point. Combining sequences hash as their component code points (NFC vs
  * NFD input differs — normalize upstream if that matters).
  */
case class PolyHash(child: Expression)
  extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = Kernels.polyHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.polyHash($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHash = copy(child = newChild)
}

/** Dot product of two float32 arrays: per-element float multiply, sequential
  * float64 accumulation — identical to
  * `aggregate(zip_with(a,b,(x,y)->x*y), 0D, (acc,v)->acc+v)` and to the
  * DuckDB list-comprehension form used by the oracles. Length mismatch or a
  * null element → NULL, exactly like the HOF fold (zip_with pads the
  * shorter array with nulls, and any null product nulls the sum) — the
  * equivalence [[graft.plans.RewriteFloatDot]] relies on.
  */
case class FloatDot(left: Expression, right: Expression)
  extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (x.numElements() != y.numElements()) null else Kernels.floatDotSameLen(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("graftDot")
      s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        java.lang.Double $r = graft.functions.Kernels.floatDotSameLen($a, $b);
        if ($r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $r.doubleValue(); }
      }"""
    })
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

/** Count of array elements contained in a fixed vocabulary (duplicates
  * counted) — equal to `size(filter(arr, t -> t IN vocab))` without the
  * interpreted per-element lambda. The vocab set is built once per JVM via a
  * codegen reference object.
  */
case class VocabCount(child: Expression, vocab: Seq[String])
  extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType

  @transient private lazy val vocabSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    vocab.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    Kernels.vocabCount(input.asInstanceOf[ArrayData], vocabSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("vocabSet", vocabSet, classOf[java.util.HashSet[UTF8String]].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.vocabCount($c, $setRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): VocabCount = copy(child = newChild)
}

/** See [[Kernels.hashScore]] — hashed linear classifier inference over a
  * token array. The weight table (a learned model's bucket weights, or a
  * deterministic stand-in for oracle-pinned tests) rides the plan as a
  * codegen reference object: shipped once per executor with the task
  * binary, indexed per feature, never rebuilt per row. `weights` is a Seq
  * so the case class keeps value equality for plan canonicalization; the
  * eval path reads a memoized primitive array.
  */
case class HashScore(child: Expression, weights: Seq[Long])
  extends UnaryExpression {
  require(weights.nonEmpty, "hashScore needs a non-empty weight table")
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  @transient private lazy val weightArr: Array[Long] = weights.toArray

  override def nullSafeEval(input: Any): Any =
    Kernels.hashScore(input.asInstanceOf[ArrayData], weightArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("hashScoreWeights", weightArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("graftHashScore")
      s"""
      java.lang.Long $r = graft.functions.Kernels.hashScore($c, $wRef);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $r.longValue(); }"""
    })
  }
  override protected def withNewChildInternal(newChild: Expression): HashScore = copy(child = newChild)
}

/** See [[Kernels.phraseMerge]] — greedy merge of mined adjacent-bigram
  * phrases into joined tokens, one pass per row. `phrases` is the mined
  * (w1, w2) pair list (a Seq, so the case class keeps value equality for
  * plan canonicalization — callers sort it); the two-level probe table is
  * memoized and rides the plan as a codegen reference object, shipped once
  * per executor like [[HashScore]]'s weights. The phrase table is
  * vocabulary-sized (mined pairs above a count+association threshold), the
  * standard word2phrase broadcast-table contract — the 100 TB pass stays
  * map-only.
  */
case class PhraseMerge(child: Expression, phrases: Seq[(String, String)])
  extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val table: java.util.HashMap[UTF8String, java.util.HashSet[UTF8String]] = {
    val m = new java.util.HashMap[UTF8String, java.util.HashSet[UTF8String]]()
    phrases.foreach { case (a, b) =>
      m.computeIfAbsent(UTF8String.fromString(a),
        _ => new java.util.HashSet[UTF8String]()).add(UTF8String.fromString(b))
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    Kernels.phraseMerge(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("phraseTable", table, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("graftPhraseMerge")
      s"""
      org.apache.spark.sql.catalyst.util.ArrayData $r =
        graft.functions.Kernels.phraseMerge($c, $tRef);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $r; }"""
    })
  }
  override protected def withNewChildInternal(newChild: Expression): PhraseMerge = copy(child = newChild)
}
