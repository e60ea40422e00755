package graft

import graft.functions.{FloatDot, PolyHash}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extension registering graft's native expressions as SQL functions
  * (`spark.sql.extensions=graft.GraftExtensions`), so `spark.sql("SELECT
  * graft_poly_hash(text) ...")` works alongside the Column API.
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
  }
}
