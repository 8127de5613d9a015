package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}
import graft.functions.DotI64

/** Optimizer rule: rewrite the interpreted higher-order-function norm
  * pattern `aggregate(zip_with(a, a, (x, y) -> x * y), 0L, (acc, v) ->
  * acc + v)` to the codegen'd [[DotI64]] loop.
  *
  * Deliberately conservative — it fires only when:
  *  - both zip_with inputs are the SAME expression (self-dot / norm),
  *    because zip_with null-pads unequal-length arrays (null result)
  *    while DotI64 folds the shorter prefix — for `a ⋅ a` lengths are
  *    trivially equal, so the rewrite is semantics-preserving;
  *  - the element type is non-null BIGINT (null elements propagate
  *    null through the HOF, DotI64 assumes none);
  *  - the lambdas are exactly multiply / add / identity over their own
  *    parameters (matched by exprId, not name).
  *
  * Injected via [[graft.GraftExtensions]] — SQL users writing the
  * textbook norm formulation get the fast path without code changes.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedExpression): Boolean = (e, v) match {
    case (a: NamedLambdaVariable, b: NamedLambdaVariable) => a.exprId == b.exprId
    case _ => false
  }

  private def longArrayNoNulls(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, containsNull) => !containsNull
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(l, r, LambdaFunction(Multiply(x, y, _), Seq(px, py), _)),
          Literal(0L, LongType),
          LambdaFunction(Add(acc, v, _), Seq(pacc, pv), _),
          LambdaFunction(fin, Seq(pfin), _))
        if l.semanticEquals(r) && longArrayNoNulls(l) && longArrayNoNulls(r) &&
          ((isVar(x, px) && isVar(y, py)) || (isVar(x, py) && isVar(y, px))) &&
          ((isVar(acc, pacc) && isVar(v, pv)) || (isVar(acc, pv) && isVar(v, pacc))) &&
          isVar(fin, pfin) =>
      DotI64(l, r)
  }
}
