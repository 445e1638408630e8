package graft

import org.apache.spark.sql.functions._

/** The co-located join story (SURVEY.md §5): persisting both fact tables
  * bucketed by the join key lets the join run with NO shuffle exchange —
  * at 100 TB this turns the recurring orders-lineitem join from the
  * dominant cost into a local zip of buckets. */
class BucketingSpec extends SparkSpecBase {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // the in-memory catalog forgets tables across JVMs but the warehouse
    // directories persist — clear them or saveAsTable refuses the location
    Seq("b_orders", "b_lineitem").foreach { t =>
      val dir = new java.io.File(new java.net.URI(warehouse).getPath, t)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    spark.read.parquet(s"$sfDir/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    // at sf0.001 both facts fit under the broadcast threshold, which would
    // bypass the bucketed layout; disable it to see the at-scale plan
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
    val p = try plan(joined) finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    // the join must consume the bucketed layout directly: no exchange on
    // either join key anywhere in the plan (the only shuffle left is the
    // final small groupBy on o_orderpriority)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("hashpartitioning(o_orderkey")
      && !p.contains("hashpartitioning(l_orderkey"), p)
    assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"), p)

    // and values are unchanged vs the plain-parquet join
    val plain = spark.read.parquet(s"$sfDir/orders.parquet")
      .join(spark.read.parquet(s"$sfDir/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
    assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)
    assert(warehouse != null)
  }
}
