package graft

import graft.functions.{BpeCount, BpeSegment, FloatDot, HashScore, NfcNormalize, NormTokens, PhraseMerge, PolyHash, ScriptRoute, SimHashFold, VocabCount}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

/** Session extension wiring graft into the engine proper
  * (`spark.sql.extensions=graft.GraftExtensions`):
  *
  *  - the native kernels become SQL functions, so `spark.sql("SELECT
  *    graft_poly_hash(text) ...")` works alongside the Column API;
  *  - [[graft.plans.RewriteFloatDot]] runs as an optimizer rule, rewriting
  *    the portable higher-order-function dot-product idiom into the
  *    codegen'd [[graft.functions.FloatDot]] kernel.
  *
  * Table-carrying kernels (hash score weights, vocab sets, phrase pairs,
  * BPE merges) take their table as a LITERAL array argument, folded once at
  * plan build into the expression's reference object — SQL callers write
  * `graft_phrase_merge(toks, array('new york', 'los angeles'))` and pay the
  * parse exactly once per plan, not per row. `graft_hash_score(toks)` with
  * no table uses the engine's deterministic stand-in weights (the
  * q_hash_classifier contract); pass `graft_hash_score(toks, weights)` to
  * run a learned table (e.g. TextOps.trainHashNb's output).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, cls, b) =>
      ext.injectFunction((FunctionIdentifier(name), new ExpressionInfo(cls, name), b))
    }
    ext.injectOptimizerRule(_ => graft.plans.RewriteFloatDot)
  }
}

object GraftExtensions {
  /** Post-hoc registration on an existing session (e.g. a shared test
    * session built without the extensions config).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, _, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }

  /** One builder table, shared verbatim by the injected and post-hoc paths
    * so the two SQL surfaces can never drift.
    */
  private val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_poly_hash", classOf[PolyHash].getName,
      exprs => PolyHash(arg(exprs, 0, "graft_poly_hash", "string"))),
    ("graft_float_dot", classOf[FloatDot].getName,
      exprs => FloatDot(arg(exprs, 0, "graft_float_dot", "array<float>"),
        arg(exprs, 1, "graft_float_dot", "array<float>"))),
    ("graft_simhash_fold", classOf[SimHashFold].getName,
      exprs => SimHashFold(arg(exprs, 0, "graft_simhash_fold", "array<bigint>"),
        graft.operators.TextOps.SimHashBits)),
    ("graft_norm_tokens", classOf[NormTokens].getName,
      exprs => NormTokens(arg(exprs, 0, "graft_norm_tokens", "string"))),
    ("graft_nfc_normalize", classOf[NfcNormalize].getName,
      exprs => NfcNormalize(arg(exprs, 0, "graft_nfc_normalize", "string"))),
    ("graft_script_route", classOf[ScriptRoute].getName,
      exprs => scriptRoute(arg(exprs, 0, "graft_script_route", "string"))),
    ("graft_hash_score", classOf[HashScore].getName,
      exprs =>
        if (exprs.lengthCompare(1) <= 0)
          HashScore(arg(exprs, 0, "graft_hash_score", "array<string> tokens"),
            graft.operators.TextOps.classifierWeights().toSeq)
        else HashScore(exprs.head, litLongs(
          arg(exprs, 1, "graft_hash_score", "weights table"), "graft_hash_score"))),
    ("graft_vocab_count", classOf[VocabCount].getName,
      exprs => VocabCount(arg(exprs, 0, "graft_vocab_count", "array<string> tokens"),
        litStrings(arg(exprs, 1, "graft_vocab_count", "vocab table"), "graft_vocab_count"))),
    ("graft_phrase_merge", classOf[PhraseMerge].getName,
      exprs => PhraseMerge(arg(exprs, 0, "graft_phrase_merge", "array<string> tokens"),
        litPairs(arg(exprs, 1, "graft_phrase_merge", "phrase table"), "graft_phrase_merge"))),
    ("graft_bpe_segment", classOf[BpeSegment].getName,
      exprs => BpeSegment(arg(exprs, 0, "graft_bpe_segment", "array<string> tokens"),
        litPairs(arg(exprs, 1, "graft_bpe_segment", "merge table"), "graft_bpe_segment"))),
    ("graft_bpe_count", classOf[BpeCount].getName,
      exprs => BpeCount(arg(exprs, 0, "graft_bpe_count", "array<string> tokens"),
        litPairs(arg(exprs, 1, "graft_bpe_count", "merge table"), "graft_bpe_count"))),
  )

  /** graft_script_route(text): the script-first routing kernel with the
    * engine's routing tables baked in — NULL means "fall through to the
    * stopword scorer" (SQL callers compose with COALESCE over langId-style
    * scores, exactly like [[graft.operators.TextOps.langRoute]]).
    */
  private[graft] def scriptRoute(child: Expression): ScriptRoute =
    ScriptRoute(child, graft.operators.TextOps.ScriptClasses,
      graft.operators.TextOps.ScriptUniqueLangs, graft.operators.TextOps.KanaRouteInv)

  // ---- literal-table extraction (plan-build time, driver) -----------------
  // Fails at FUNCTION RESOLUTION for a non-foldable table argument — the
  // same fail-early contract ScriptRoute's eager table validation follows:
  // a per-row-varying table would mean rebuilding a hash set per row, which
  // is never what a caller wants and deserves an analysis error, not a
  // slow query. NULL elements are rejected the same way: unchecked, an
  // array<bigint> NULL would unbox to 0L and silently zero one bucket's
  // weight (review r16) — a wrong-results class, not an error class.
  private def arg(exprs: Seq[Expression], i: Int, fn: String, want: String): Expression = {
    require(exprs.lengthCompare(i) > 0,
      s"$fn: missing argument ${i + 1} ($want)")
    exprs(i)
  }

  private def litArray(e: Expression, fn: String): ArrayData = {
    require(e.foldable, s"$fn: the table argument must be a literal array")
    val v = e.eval(InternalRow.empty)
    require(v != null, s"$fn: the table argument must not be null")
    val arr = v.asInstanceOf[ArrayData]
    (0 until arr.numElements()).foreach(i =>
      require(!arr.isNullAt(i), s"$fn: table element ${i + 1} is NULL"))
    arr
  }

  private def litStrings(e: Expression, fn: String): Seq[String] = {
    val arr = litArray(e, fn)
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  private def litLongs(e: Expression, fn: String): Seq[Long] = {
    val arr = litArray(e, fn)
    e.dataType match {
      case ArrayType(LongType, _) => arr.toLongArray().toSeq
      case ArrayType(IntegerType, _) => arr.toIntArray().map(_.toLong).toSeq
      case t => throw new IllegalArgumentException(
        s"$fn: want array<bigint> weights, got $t")
    }
  }

  /** Pair tables ride SQL as 'first second' strings — tokens never contain
    * spaces (the tokenizer splits on non-letter/digit), so the first space
    * splits back unambiguously, the same encoding the mined collocation
    * bigrams use.
    */
  private def litPairs(e: Expression, fn: String): Seq[(String, String)] =
    litStrings(e, fn).map { s =>
      val i = s.indexOf(' ')
      require(i > 0 && i < s.length - 1,
        s"$fn: pair entries are 'first second', got '$s'")
      // A second space ('a b c') would silently encode a second component
      // containing a space — tokenizer output never does, so such an entry
      // could never match and would be a silent no-op instead of the
      // fail-early error this validation promises (ADVICE r16). BPE tables
      // legitimately end components with '</w>' but never hold a second
      // space, so the check is safe for all four consumers.
      require(s.indexOf(' ', i + 1) < 0,
        s"$fn: pair entries are 'first second' with exactly one space, got '$s'")
      (s.substring(0, i), s.substring(i + 1))
    }
}
