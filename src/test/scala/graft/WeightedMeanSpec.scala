package graft

import graft.functions.WeightedMean
import org.apache.spark.sql.functions._

class WeightedMeanSpec extends SparkSpecBase {

  test("weighted mean matches the declarative decimal formula exactly") {
    spark.udf.register("weighted_mean", udaf(WeightedMean))
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val got = li.groupBy("l_returnflag")
      .agg(expr("weighted_mean(l_extendedprice, l_quantity)").as("wm"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = li.groupBy("l_returnflag")
      .agg((sum(expr("CAST(l_extendedprice * l_quantity AS DECIMAL(28,8))")).cast("double")
        / sum(expr("CAST(l_quantity AS DECIMAL(18,4))")).cast("double")).as("wm"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-9, s"$k: $v vs ${want(k)}")
    }
  }

  test("weighted mean is partition-order independent") {
    spark.udf.register("weighted_mean", udaf(WeightedMean))
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val a = li.repartition(1)
      .agg(expr("weighted_mean(l_extendedprice, l_quantity)")).collect()(0).getDouble(0)
    val b = li.repartition(17, col("l_orderkey"))
      .agg(expr("weighted_mean(l_extendedprice, l_quantity)")).collect()(0).getDouble(0)
    assert(a == b) // bit-identical: decimal partials are merge-order-free
  }

  test("empty input yields NaN, not a crash") {
    spark.udf.register("weighted_mean", udaf(WeightedMean))
    val r = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_quantity") < -1)
      .agg(expr("weighted_mean(l_extendedprice, l_quantity)")).collect()(0)
    assert(r.isNullAt(0) || r.getDouble(0).isNaN)
  }
}
