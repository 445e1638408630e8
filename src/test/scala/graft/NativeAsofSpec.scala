package graft

import graft.operators.AsofJoin
import graft.plans.AsofJoinNative
import org.apache.spark.sql.functions._

/** The native merge as-of operator (logical node + strategy + exec). */
class NativeAsofSpec extends SparkSpecBase {

  test("native asof plans as AsofJoinExec with one exchange per side, no window") {
    val df = AsofJoin.purchaseAsofClickNative(spark, sfDir)
    val p = plan(df)
    assert(p.contains("AsofJoin"), p)
    assert(!p.contains("Window"), p)
    // the merge itself adds exactly the two child hash exchanges; the
    // trailing total-order ORDER BY is a rangepartitioning exchange
    val exchanges = "hashpartitioning\\(".r.findAllIn(p).length
    assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges:\n$p")
  }

  test("native asof matches the declarative union+window implementation row for row") {
    val native = AsofJoin.purchaseAsofClickNative(spark, sfDir).collect()
    val declarative = AsofJoin.purchaseAsofClick(spark, sfDir).collect()
    assert(native.length == declarative.length)
    native.zip(declarative).foreach { case (n, d) => assert(n == d) }
  }

  test("native asof edge cases: no-match keys null-fill, exact-tie matches inclusively") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"), (3L, 7L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 6L, 60.0), (9L, 1L, 9.0))
      .toDF("k", "t", "v")
    val got = AsofJoinNative.asof(left, right, "k", "t", Seq("v"))
      .orderBy("k", "t").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("t"), r.getAs[String]("tag"),
        Option(r.getAs[java.lang.Long]("asof_time")).map(_.toLong),
        Option(r.getAs[java.lang.Double]("asof_v")).map(_.toDouble)))
    assert(got.toSeq == Seq(
      (1L, 10L, "a", Some(10L), Some(100.0)), // tie: right.t <= left.t is inclusive
      (1L, 20L, "b", Some(15L), Some(150.0)), // latest at-or-before wins
      (2L, 5L, "c", None, None),              // right row is strictly after
      (3L, 7L, "d", None, None)))             // key absent on the right
  }

  test("native asof streams duplicate left timestamps and empty partitions correctly") {
    import spark.implicits._
    // many keys spread across partitions; some keys have empty right sides
    val left = (1L to 400L).map(i => (i % 20, i, s"L$i")).toDF("k", "t", "tag")
    val right = (1L to 100L).map(i => (i % 10, i * 3, i.toDouble)).toDF("k", "t", "v")
    val got = AsofJoinNative.asof(left, right, "k", "t", Seq("v")).collect()
    assert(got.length == 400)
    // oracle: per (k, t) the max right t' <= t with k match
    val rightByK = (1L to 100L).map(i => (i % 10, i * 3, i.toDouble)).groupBy(_._1)
    got.foreach { r =>
      val k = r.getAs[Long]("k"); val t = r.getAs[Long]("t")
      val expect = rightByK.getOrElse(k, Seq()).filter(_._2 <= t).sortBy(_._2).lastOption
      assert(Option(r.getAs[java.lang.Long]("asof_time")).map(_.toLong) == expect.map(_._2), (k, t))
      assert(Option(r.getAs[java.lang.Double]("asof_v")).map(_.toDouble) == expect.map(_._3), (k, t))
    }
  }
}
