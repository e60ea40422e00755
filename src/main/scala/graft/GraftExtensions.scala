package graft

import graft.functions.{FloatDot, NfcNormalize, NormTokens, PolyHash, ScriptRoute, SimHashFold}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extension wiring graft into the engine proper
  * (`spark.sql.extensions=graft.GraftExtensions`):
  *
  *  - the native kernels become SQL functions, so `spark.sql("SELECT
  *    graft_poly_hash(text) ...")` works alongside the Column API;
  *  - [[graft.plans.RewriteFloatDot]] runs as an optimizer rule, rewriting
  *    the portable higher-order-function dot-product idiom into the
  *    codegen'd [[graft.functions.FloatDot]] kernel.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_poly_hash"),
      exprs => PolyHash(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "graft_float_dot"),
      exprs => FloatDot(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash_fold"),
      new ExpressionInfo(classOf[SimHashFold].getName, "graft_simhash_fold"),
      exprs => SimHashFold(exprs.head, graft.operators.TextOps.SimHashBits)))
    ext.injectFunction((
      FunctionIdentifier("graft_norm_tokens"),
      new ExpressionInfo(classOf[NormTokens].getName, "graft_norm_tokens"),
      exprs => NormTokens(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc_normalize"),
      exprs => NfcNormalize(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_script_route"),
      new ExpressionInfo(classOf[ScriptRoute].getName, "graft_script_route"),
      exprs => GraftExtensions.scriptRoute(exprs.head)))
    ext.injectOptimizerRule(_ => graft.plans.RewriteFloatDot)
  }
}

object GraftExtensions {
  /** Post-hoc registration on an existing session (e.g. a shared test
    * session built without the extensions config).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_poly_hash", exprs => PolyHash(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_float_dot", exprs => FloatDot(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash_fold",
      exprs => SimHashFold(exprs.head, graft.operators.TextOps.SimHashBits), "built-in")
    reg.createOrReplaceTempFunction("graft_norm_tokens", exprs => NormTokens(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_nfc_normalize", exprs => NfcNormalize(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_script_route",
      exprs => GraftExtensions.scriptRoute(exprs.head), "built-in")
  }

  /** graft_script_route(text): the script-first routing kernel with the
    * engine's routing tables baked in — NULL means "fall through to the
    * stopword scorer" (SQL callers compose with COALESCE over langId-style
    * scores, exactly like [[graft.operators.TextOps.langRoute]]).
    */
  private[graft] def scriptRoute(child: org.apache.spark.sql.catalyst.expressions.Expression): ScriptRoute =
    ScriptRoute(child, graft.operators.TextOps.ScriptClasses,
      graft.operators.TextOps.ScriptUniqueLangs, graft.operators.TextOps.KanaRouteInv)
}
