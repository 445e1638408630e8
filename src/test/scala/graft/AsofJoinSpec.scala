package graft

import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpecBase {

  test("as-of join picks the latest right row at-or-before, inclusive") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 5L, "b"), (2L, 7L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 100.0), (1L, 8L, 200.0), (1L, 11L, 300.0), (3L, 1L, 999.0))
      .toDF("k", "t", "v")
    val out = AsofJoin.asofOn(left, right, "k", "t", Seq("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4))).toSet
    assert(out == Set(
      (1L, 10L, "a", 8L, 200.0),   // latest <= 10 is t=8
      (1L, 5L, "b", 5L, 100.0),    // inclusive: equal timestamp matches
      (2L, 7L, "c", -1L, -1.0)))   // key with no right rows -> nulls
  }

  test("as-of join output row count equals left row count") {
    val df = AsofJoin.purchaseAsofClick(spark, sfDir)
    val purchases = graft.sources.Tables.events(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase").count()
    assert(df.count() == purchases)
  }
}
