package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{HammingStr, MortonInterleave, VectorDot}

/** SparkSessionExtensions entry point: enable with
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * Injects graft's native expressions into every session built with the
  * config — the deployment path a cluster would use (the specs and query
  * builders also register programmatically via GraftFunctions.register so
  * a plain session works too).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (children: Seq[Expression]) => VectorDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("morton_interleave"),
      new ExpressionInfo(classOf[MortonInterleave].getName, "morton_interleave"),
      (children: Seq[Expression]) => MortonInterleave(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("hamming_str"),
      new ExpressionInfo(classOf[HammingStr].getName, "hamming_str"),
      (children: Seq[Expression]) => HammingStr(children(0), children(1))))
    ext.injectOptimizerRule(_ => NativeDotRule)
    ext.injectPlannerStrategy(_ => AsofJoinStrategy)
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
  }
}
