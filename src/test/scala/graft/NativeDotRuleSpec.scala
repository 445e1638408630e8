package graft

import graft.plans.NativeDotRule
import org.apache.spark.sql.functions._

class NativeDotRuleSpec extends SparkSpecBase {

  private val foldExpr =
    "aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"

  test("rule rewrites the declarative fold into native vector_dot") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ NativeDotRule
    try {
      val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .selectExpr(s"$foldExpr AS d")
      val optimized = df.queryExecution.optimizedPlan
      val hasNative = optimized.expressions.exists(_.find {
        case _: graft.functions.VectorDot => true
        case _ => false
      }.isDefined)
      assert(hasNative, optimized.toString)
      // and the rewritten plan still computes the right values
      val viaRule = df.agg(sum("d")).collect()(0).getDouble(0)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == NativeDotRule)
      val plain = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .selectExpr(s"$foldExpr AS d").agg(sum("d")).collect()(0).getDouble(0)
      assert(viaRule == plain)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == NativeDotRule)
    }
  }

  test("rule leaves non-matching folds untouched") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ NativeDotRule
    try {
      // a sum-of-squares fold over a DOUBLE array must NOT be rewritten
      val df = spark.range(1).selectExpr(
        "aggregate(zip_with(array(1.0D, 2.0D), array(3.0D, 4.0D), (x, y) -> x * y), " +
          "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d")
      val optimized = df.queryExecution.optimizedPlan
      val hasNative = optimized.expressions.exists(_.find {
        case _: graft.functions.VectorDot => true
        case _ => false
      }.isDefined)
      assert(!hasNative, optimized.toString)
      assert(df.collect()(0).getDouble(0) == 11.0)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == NativeDotRule)
    }
  }
}
