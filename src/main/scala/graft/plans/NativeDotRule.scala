package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.functions.VectorDot

/** Optimizer rule: rewrite the portable declarative dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
  *             CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
  *
  * over ARRAY<FLOAT> / ARRAY<DOUBLE> columns (the per-element CAST is
  * absent when a side is already ARRAY<DOUBLE>) into the native codegen
  * VectorDot expression. Semantics are identical (left-to-right double
  * accumulation — see VectorDot's scaladoc); users writing the
  * engine-portable SQL form get the native loop automatically. Injected by
  * GraftExtensions (injectOptimizerRule) or via
  * spark.experimental.extraOptimizations.
  */
object NativeDotRule extends Rule[LogicalPlan] {

  private def isVecArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** The multiply operand reads the lambda variable as a double: either a
    * CAST(v AS DOUBLE) over a float element or the double variable itself. */
  private def readsAsDouble(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case Cast(c: NamedLambdaVariable, DoubleType, _, _) => c.exprId == v.exprId
    case c: NamedLambdaVariable => c.exprId == v.exprId && c.dataType == DoubleType
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(l, r, LambdaFunction(Multiply(mx, my, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        Literal(0.0, DoubleType),
        LambdaFunction(Add(aa: NamedLambdaVariable, av: NamedLambdaVariable, _),
          Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
        if isVecArray(l) && isVecArray(r)
          && readsAsDouble(mx, x) && readsAsDouble(my, y)
          && aa.exprId == acc.exprId && av.exprId == v.exprId
          && fin.exprId == fv.exprId =>
      VectorDot(l, r)
  }
}
