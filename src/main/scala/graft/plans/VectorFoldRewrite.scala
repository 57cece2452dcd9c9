package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: rewrite the portable higher-order-function dot-product
  * pattern
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
  *               CAST(0 AS DOUBLE), (acc, v) -> acc + v) }}}
  *
  * into the fused, allocation-free [[DotProduct]] native expression. Safe
  * because both run the identical sequential double fold (bit-equality
  * pinned by VectorExpressionSpec), but the native form skips the
  * intermediate product array and per-element lambda dispatch.
  *
  * Users write the portable form (it also runs on stock Spark); sessions
  * with graft's extensions installed execute the fast one. Injected by
  * [[GraftExtensions]] at session build, or post-hoc via
  * `GraftExtensions.ensureRegistered` (experimental methods hook).
  */
object VectorFoldRewrite extends Rule[LogicalPlan] {

  /** x is one of the lambda's two variables, optionally cast to double. */
  private def isVarMaybeCast(e: Expression, v: NamedExpression): Boolean = e match {
    case Cast(c: NamedLambdaVariable, DoubleType, _, _) => c.exprId == v.exprId
    case c: NamedLambdaVariable => c.exprId == v.exprId && c.dataType == DoubleType
    case _ => false
  }

  /** The operand's element type is one DotProduct supports. The rewrite must
    * NOT fire for ARRAY<INT>/ARRAY<LONG>/ARRAY<DECIMAL> inputs — the pattern
    * would still match (the lambda casts them to double), but DotProduct's
    * checkInputDataTypes rejects them post-analysis and its interpreted eval
    * reads 8-byte slots, so the guard mirrors
    * VectorFoldExpression.checkInputDataTypes exactly.
    */
  private def isFloatingArray(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(et, _) =>
      et == org.apache.spark.sql.types.FloatType || et == DoubleType
    case _ => false
  }

  /** zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) */
  private def matchZipMultiply(e: Expression): Option[(Expression, Expression)] = e match {
    case ZipWith(a, b, LambdaFunction(Multiply(mx, my, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _))
        if ((isVarMaybeCast(mx, x) && isVarMaybeCast(my, y)) ||
           (isVarMaybeCast(mx, y) && isVarMaybeCast(my, x))) &&
          isFloatingArray(a) && isFloatingArray(b) =>
      Some((a, b))
    case _ => None
  }

  /** (acc, v) -> acc + v */
  private def isSumMerge(merge: Expression): Boolean = merge match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      (l.exprId == acc.exprId && r.exprId == v.exprId) ||
        (l.exprId == v.exprId && r.exprId == acc.exprId)
    case _ => false
  }

  /** finish lambda is the identity on the accumulator. */
  private def isIdentityFinish(finish: Expression): Boolean = finish match {
    case LambdaFunction(out: NamedLambdaVariable, Seq(acc: NamedLambdaVariable), _) =>
      out.exprId == acc.exprId
    case _ => false
  }

  private def isZeroLiteral(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case Cast(Literal(0, _), DoubleType, _, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(zipped, zero, merge, finish)
        if isZeroLiteral(zero) && isSumMerge(merge) && isIdentityFinish(finish) &&
          matchZipMultiply(zipped).isDefined =>
      val (a, b) = matchZipMultiply(zipped).get
      DotProduct(a, b)
  }
}
