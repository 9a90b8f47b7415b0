package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the higher-order-function dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *             0.0d, (acc, v) -> acc + v)
  *
  * into the native codegen'd [[DotProduct]] when `a` and `b` are
  * `array<float>` with non-nullable elements. The HOF form evaluates its
  * lambdas interpreted (one closure call per element); the native form is
  * a fused loop. Identical semantics: same ascending-index double
  * accumulation; unequal-length inputs yield NULL in both forms (zip_with
  * pads the shorter side with nulls, which nulls the sum — DotProduct
  * returns null on length mismatch to match); and the rewrite is guarded
  * on `containsNull = false` because the HOF propagates a null ELEMENT to
  * a null result while the native loop reads raw slots.
  *
  * Injected by [[GraftExtensions]] via `injectOptimizerRule` — the (c)
  * rung of the custom-Catalyst ladder (SURVEY.md §4).
  */
case class RewriteDotProduct(unused: Any = null) extends Rule[LogicalPlan] {

  private def isFloatArrayNoNulls(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, containsNull) => !containsNull
    case _ => false
  }

  private def isMulLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(Cast(x: NamedLambdaVariable, DoubleType, _, _),
        Cast(y: NamedLambdaVariable, DoubleType, _, _), _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      (x.exprId == a.exprId && y.exprId == b.exprId) ||
        (x.exprId == b.exprId && y.exprId == a.exprId)
    case _ => false
  }

  private def isAddLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      x.exprId == a.exprId && y.exprId == b.exprId
    case _ => false
  }

  private def isIdentityLambda(f: Expression): Boolean = f match {
    case LambdaFunction(x: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      x.exprId == a.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(left, right, mergeFn),
          Literal(0.0, DoubleType), addFn, finishFn)
          if isFloatArrayNoNulls(left) && isFloatArrayNoNulls(right) &&
            isMulLambda(mergeFn) && isAddLambda(addFn) &&
            isIdentityLambda(finishFn) =>
        DotProduct(left, right)
    }
}
