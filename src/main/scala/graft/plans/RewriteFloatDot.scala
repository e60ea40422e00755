package graft.plans

import graft.functions.FloatDot
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

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
  * Injected by [[graft.GraftExtensions]].
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
