package graft

import graft.plans.TopKPerKeyNative
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Native per-key top-k operator (SURVEY.md §2.H): heap-based exec that
  * replaces the rank-window's full partition sort. */
class TopKPerKeySpec extends SparkSpecBase {

  private def input = Tables.orders(spark, sfDir).select(
    col("o_custkey"), col("o_orderkey"),
    expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("price_cents"))

  test("plans as two-phase TopKPerKey with one exchange and NO sort") {
    val p = plan(TopKPerKeyNative.topK(input, "o_custkey", "price_cents", "o_orderkey", 3))
    assert(p.contains("TopKPerKey"), p)
    // map-side partial phase below the exchange: the shuffle carries at
    // most k rows per (task, key), not every row
    assert(p.contains("TopKPerKeyPartial"), p)
    assert(p.linesIterator.count(_.matches("""\(\d+\) Exchange.*""")) == 1, p)
    // the whole point: no sort anywhere — the rank-window form sorts every
    // partition in full
    assert(!p.contains("Sort ["), p)
  }

  test("matches the rank-window formulation row for row") {
    val native = TopKPerKeyNative.topK(input, "o_custkey", "price_cents", "o_orderkey", 3)
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("price_cents").desc, col("o_orderkey").asc)
    val windowed = input
      .withColumn("topk_rank", row_number().over(w).cast("long"))
      .filter(col("topk_rank") <= 3)
    assert(native.count() > 0)
    assert(native.exceptAll(windowed).isEmpty && windowed.exceptAll(native).isEmpty,
      s"native=${native.count()} window=${windowed.count()}")
  }

  test("output is independent of input partitioning and arrival order") {
    val base = TopKPerKeyNative.topK(input, "o_custkey", "price_cents", "o_orderkey", 2)
      .collect().toSet
    val shuffled = TopKPerKeyNative.topK(
      input.repartition(7).sortWithinPartitions(col("o_orderkey").desc),
      "o_custkey", "price_cents", "o_orderkey", 2).collect().toSet
    assert(base == shuffled)
    assert(base.nonEmpty)
  }

  test("a 99%-skewed key stays correct through the partial phase") {
    import spark.implicits._
    // one key owns almost every row — the shape the map-side partial
    // phase exists for: each task forwards at most k rows for the hot key
    val skewed = spark.range(200000L).select(
      when(col("id") % 100 === 0, col("id")).otherwise(lit(0L)).as("k"),
      (col("id") * 7919L % 100000L).as("v"),
      col("id").as("t"))
      .repartition(8)
    val native = TopKPerKeyNative.topK(skewed, "k", "v", "t", 5)
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("t").asc)
    val windowed = skewed
      .withColumn("topk_rank", row_number().over(w).cast("long"))
      .filter(col("topk_rank") <= 5)
    assert(native.exceptAll(windowed).isEmpty && windowed.exceptAll(native).isEmpty,
      s"native=${native.count()} window=${windowed.count()}")
  }

  test("partial phase flushes past MaxPartialKeys distinct keys without loss") {
    // one input partition holding MORE distinct keys than the partial
    // phase's flush threshold: the map side must flush mid-stream (bounded
    // state) and the flushed superset must still reduce to the exact
    // per-key top-k after the shuffle
    val nKeys = graft.plans.TopKPerKeyExec.MaxPartialKeys + 1000
    val wide = spark.range(nKeys.toLong)
      .select(col("id").as("k"), (col("id") % 97L).as("v"), col("id").as("t"))
      .coalesce(1)
    val out = TopKPerKeyNative.topK(wide, "k", "v", "t", 2)
    // every key appears exactly once (one row per key), always rank 1
    assert(out.count() == nKeys.toLong)
    assert(out.filter(col("topk_rank") =!= 1L).isEmpty)
  }

  test("non-BIGINT columns and k <= 0 fail fast at the API boundary") {
    val bad = input.withColumn("price_str", col("price_cents").cast("string"))
    val e = intercept[IllegalArgumentException] {
      TopKPerKeyNative.topK(bad, "o_custkey", "price_str", "o_orderkey", 3)
    }
    assert(e.getMessage.contains("BIGINT"))
    intercept[IllegalArgumentException] {
      TopKPerKeyNative.topK(input, "o_custkey", "price_cents", "o_orderkey", 0)
    }
  }

  test("k larger than any group returns every row, ranked totally per key") {
    val small = input.filter(col("o_custkey") < 20)
    val all = TopKPerKeyNative.topK(small, "o_custkey", "price_cents", "o_orderkey", 1000000)
    assert(all.count() == small.count())
    // ranks are 1..groupSize, dense
    val bad = all.groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), max("topk_rank").as("mx"), min("topk_rank").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1L)
    assert(bad.isEmpty)
  }
}
