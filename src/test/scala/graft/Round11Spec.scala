package graft

import graft.operators.{Events, GraphOps, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-11 operator pins: PMI-lift collocations (ta_cooccur), count-min
  * heavy hitters (ev_heavy_hitters), HLL register build (ev_hll), and
  * bipartite co-purchase projection (gr_copurchase). */
class Round11Spec extends SparkSpecBase {

  test("cooccur: window shape, canonicalization, and the lift arithmetic") {
    import spark.implicits._
    // doc 0 alternates a/b: d1 pairs (a,b)x5 + (b,a)x4 -> canonical
    // (a,b) c12=9; d2 pairs (a,a)x4 + (b,b)x4 stay under CoocMinPair=5
    // individually but (a,a) merges with doc 1's. doc 1 alternates c/a:
    // (a,c) c12=9, (c,c)x4, (a,a)x4 -> (a,a) totals 8 >= 5.
    // cu: a=10, b=5, c=5, N=20.
    // lift(a,b) = ((9e6 div 10) * 20) div (1e4*5) = 360; lift(a,c) same;
    // lift(a,a) = ((8e6 div 10) * 20) div (1e4*10) = 160.
    val docs = Seq(
      (0L, "a b a b a b a b a b"),
      (1L, "c a c a c a c a c a")).toDF("doc_id", "text")
    val out = TextAnalysis.cooccurOn(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("a", "b", 9L, 10L, 5L, 360L),
      ("a", "c", 9L, 10L, 5L, 360L),
      ("a", "a", 8L, 10L, 10L, 160L)))
  }

  test("heavy_hitters: estimate bounds truth; single-key sketch is exact") {
    import spark.implicits._
    // A lone key shares no bucket with anyone in any row -> MIN cell is
    // its own count exactly.
    val lone = Seq((42L, 7L)).toDF("user_id", "true_c")
    val one = Events.heavyHittersOn(lone, 20).collect()
    assert(one.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((42L, 7L, 7L)))
    // Many keys: every estimate >= truth and <= the grand total (the CMS
    // over-count structure), output ordered by (true_c desc, user_id).
    val tc = (1L to 300L).map(u => (u, u % 13 + 1L)).toDF("user_id", "true_c")
    val rows = Events.heavyHittersOn(tc, 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 20)
    val total = (1L to 300L).map(_ % 13 + 1L).sum
    rows.foreach { case (_, t, est) =>
      assert(est >= t && est <= total)
    }
    assert(rows.map(r => (-r._2, r._1)).toSeq ==
      rows.map(r => (-r._2, r._1)).sorted.toSeq)
  }

  test("hll: bucket and rho match independently computed md5 expansions") {
    import spark.implicits._
    // md5('hll:1') = b645... -> bucket 0xb=11, suffix bits 0110... rho 2
    // md5('hll:2') = f299... -> bucket 15, suffix 0010... rho 3
    // md5('hll:3') = d712... -> bucket 13, suffix 0111... rho 2
    // users 1 and 3 in type 'x' land in different buckets; repeat events
    // dedup before hashing (n_users counts distinct).
    val pairs = Seq(
      ("x", 1L), ("x", 1L), ("x", 3L), ("y", 2L)).toDF("event_type", "user_id")
    val out = Events.hllOn(pairs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("x", 11L, 2L, 1L),
      ("x", 13L, 2L, 1L),
      ("y", 15L, 3L, 1L)))
  }

  test("copurchase: triangular pairs, repeat purchases never inflate") {
    import spark.implicits._
    // cust 1 buys {10,20,30}, cust 2 buys {10,20} (part 10 TWICE), cust 3
    // buys {20} (no pair). (10,20) shared by custs 1+2 -> weight 2.
    val inc = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 10L), (2L, 20L),
      (3L, 20L)).toDF("cust", "part")
    val out = GraphOps.copurchaseOn(inc, 30).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (10L, 20L, 2L),
      (10L, 30L, 1L),
      (20L, 30L, 1L)))
  }
}
