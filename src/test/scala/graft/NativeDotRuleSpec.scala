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

  test("rule rewrites double-array folds too (no per-element cast form)") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ NativeDotRule
    try {
      val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .selectExpr("CAST(embedding AS ARRAY<DOUBLE>) AS dv")
        .selectExpr(
          "aggregate(zip_with(dv, dv, (x, y) -> x * y), " +
            "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d")
      val optimized = df.queryExecution.optimizedPlan
      val hasNative = optimized.expressions.exists(_.find {
        case _: graft.functions.VectorDot => true
        case _ => false
      }.isDefined)
      assert(hasNative, optimized.toString)
      assert(df.agg(min("d")).collect()(0).getDouble(0) >= 0.0)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == NativeDotRule)
    }
  }

  test("rule leaves non-matching folds untouched") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ NativeDotRule
    try {
      // an element-SUM fold (not a product) must NOT be rewritten
      val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .selectExpr("CAST(embedding AS ARRAY<DOUBLE>) AS dv")
        .selectExpr(
          "aggregate(zip_with(dv, dv, (x, y) -> x + y), " +
            "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d")
      val optimized = df.queryExecution.optimizedPlan
      val hasNative = optimized.expressions.exists(_.find {
        case _: graft.functions.VectorDot => true
        case _ => false
      }.isDefined)
      assert(!hasNative, optimized.toString)
      assert(df.limit(1).collect().nonEmpty)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == NativeDotRule)
    }
  }
}
