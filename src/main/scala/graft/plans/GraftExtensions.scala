package graft.plans

import graft.functions.{FloatDot, PolyHash}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Session extensions registering the graft kernels with the engine proper:
  *
  *  - `poly_hash` / `float_dot` become SQL functions, so `spark.sql` text
  *    reaches the codegen'd kernels without touching the Scala API;
  *  - [[RewriteFloatDot]] runs as an optimizer rule, rewriting the portable
  *    higher-order-function dot-product idiom into the [[FloatDot]] kernel.
  *
  * Wire up with `.withExtensions(new GraftExtensions)` at session build, or
  * `spark.sql.extensions=graft.plans.GraftExtensions` on a cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (args: Seq[Expression]) => PolyHash(args.head)))
    ext.injectFunction((FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      (args: Seq[Expression]) => FloatDot(args(0), args(1))))
    ext.injectOptimizerRule(_ => RewriteFloatDot)
  }
}

/** Rewrites `aggregate(zip_with(a, b, (x, y) -> x * y), 0D,
  * (acc, v) -> acc + v)` over float arrays into the codegen'd
  * [[FloatDot]] kernel. The HOF form is the engine-portable way to write a
  * dot product (it is also what the DuckDB oracles compute), but Catalyst
  * interprets the lambdas per element — measured ~100× slower than the
  * kernel on embedding workloads. Semantics are identical by construction:
  * float multiply, sequential double accumulate, NULL on length mismatch or
  * null element (the padded/zipped null nulls the HOF fold the same way).
  *
  * Matching is deliberately strict — float element types, a bare `x * y`
  * (float multiply; a double multiply would NOT be kernel-equal), a
  * `0D` zero, an `acc + v` merge in either operand order, and an identity
  * finish — so the rule never fires on a fold with different semantics.
  */
object RewriteFloatDot extends Rule[LogicalPlan] {

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def idsOf(vars: Seq[NamedExpression]): Set[Long] =
    vars.map(_.exprId.id).toSet

  /** body is exactly the two lambda vars multiplied (either order). */
  private def isVarProduct(body: Expression, vars: Seq[NamedExpression]): Boolean = body match {
    case Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _) =>
      Set(x.exprId.id, y.exprId.id) == idsOf(vars) && x.exprId != y.exprId
    case _ => false
  }

  /** body is acc + v (either order), v possibly widened float→double. */
  private def isAccPlusVal(body: Expression, vars: Seq[NamedExpression]): Boolean = {
    def varId(e: Expression): Option[Long] = e match {
      case v: NamedLambdaVariable => Some(v.exprId.id)
      case Cast(v: NamedLambdaVariable, DoubleType, _, _) => Some(v.exprId.id)
      case _ => None
    }
    body match {
      case Add(l, r, _) => (varId(l), varId(r)) match {
        case (Some(x), Some(y)) => x != y && Set(x, y) == idsOf(vars)
        case _ => false
      }
      case _ => false
    }
  }

  private def isIdentity(body: Expression, vars: Seq[NamedExpression]): Boolean = body match {
    case v: NamedLambdaVariable => vars.size == 1 && v.exprId == vars.head.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(prod, zVars, _)),
          Literal(zero: Double, DoubleType),
          LambdaFunction(merge, mVars, _),
          LambdaFunction(finish, fVars, _))
        if zero == 0.0 && isFloatArray(a.dataType) && isFloatArray(b.dataType) &&
          isVarProduct(prod, zVars) && isAccPlusVal(merge, mVars) &&
          isIdentity(finish, fVars) =>
      FloatDot(a, b)
  }
}
