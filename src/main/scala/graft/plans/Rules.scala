package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the naive higher-order dot-product pattern
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x*y), 0.0, (acc, v) -> acc+v) }}}
  *
  * into the codegen'd [[DotProductExpr]] (bit-identical semantics, see
  * ExpressionsSpec). Users writing the idiomatic-but-interpreted fold
  * get the fast path automatically — the same service Catalyst's own
  * rewrites provide for built-ins. Injected by [[GraftExtensions]].
  */
object RewriteDotProductRule extends Rule[LogicalPlan] {

  private def isNumericArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  /** x * y (optionally double-cast on either side). */
  private def isMultiplyOfVars(f: Expression, x: NamedExpression,
      y: NamedExpression): Boolean = {
    def isVar(e: Expression, v: NamedExpression): Boolean = e match {
      case Cast(inner, DoubleType, _, _) => isVar(inner, v)
      case named: NamedLambdaVariable => named.exprId == v.exprId
      case _ => false
    }
    f match {
      case Multiply(l, r, _) =>
        (isVar(l, x) && isVar(r, y)) || (isVar(l, y) && isVar(r, x))
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
            zw @ ZipWith(left, right,
              LambdaFunction(mult, Seq(x: NamedLambdaVariable,
                y: NamedLambdaVariable), _)),
            Literal(zero, DoubleType),
            LambdaFunction(Add(accL, accR, _),
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            finish)
          if zero == 0.0 &&
            isNumericArray(left) && isNumericArray(right) &&
            isMultiplyOfVars(mult, x, y) &&
            isIdentityFinish(finish) &&
            isAccPlusVar(accL, accR, acc, v) =>
        DotProductExpr(left, right)
    }

  /** acc + v in either order (v possibly cast to double). */
  private def isAccPlusVar(l: Expression, r: Expression,
      acc: NamedLambdaVariable, v: NamedLambdaVariable): Boolean = {
    def is(e: Expression, t: NamedLambdaVariable): Boolean = e match {
      case Cast(inner, DoubleType, _, _) => is(inner, t)
      case named: NamedLambdaVariable => named.exprId == t.exprId
      case _ => false
    }
    (is(l, acc) && is(r, v)) || (is(l, v) && is(r, acc))
  }

  /** finish lambda is the identity (id -> id). */
  private def isIdentityFinish(finish: Expression): Boolean = finish match {
    case LambdaFunction(body: NamedLambdaVariable,
        Seq(arg: NamedLambdaVariable), _) => body.exprId == arg.exprId
    case _ => false
  }
}
