package graft

import org.apache.spark.sql.functions._

/** Round-9 session-4 specs, one per operator landed this session:
  * survival censoring + KM monotonicity, interval-overlap edge semantics
  * (touching/nested/cross-cell dedup), LATERAL decorrelation plan shape,
  * readability's sentence term + negative-score path, cost-distance
  * route-around-friction + the unreached cap, the K4 clustering
  * coefficient, RAKE deg/freq arithmetic, TRI's rugged band, graph-beam
  * search invariants + recall floor, temporal reachability's
  * decreasing-time exclusion, and the deletion-vector all-deleted file
  * group. */
class Round16Spec extends SparkSpecBase {

  test("io_deletion_vectors: an all-deleted file group stays in the report") {
    import spark.implicits._
    val base = Seq(
      (0L, 1L, 5.0), (0L, 2L, 7.0),  // group 0: both rows deleted
      (1L, 1L, 3.0), (1L, 2L, 4.0))  // group 1: one row deleted
      .toDF("file_id", "pos", "l_quantity")
    val dv = Seq((0L, 1L), (0L, 2L), (1L, 1L)).toDF("file_id", "pos")
    val got = graft.sources.ManifestIO.dvAccounting(base, dv).collect()
    assert(got.length === 2)
    // group 0 must survive with n_live = 0 and a NULL quantity mass —
    // exactly what the oracle's unconditional GROUP BY emits
    assert((got(0).getLong(0), got(0).getLong(1), got(0).getLong(2),
      got(0).getLong(3), got(0).isNullAt(4)) === (0L, 2L, 2L, 0L, true))
    assert((got(1).getLong(0), got(1).getLong(1), got(1).getLong(2),
      got(1).getLong(3), got(1).getDouble(4)) === (1L, 2L, 1L, 1L, 4.0))
  }

  test("ev_survival: censoring rule, risk-set arithmetic, KM monotone") {
    import spark.implicits._
    // durations (min): 0,1,1,2 ended long before obs end (deaths); one
    // session ends AT the observation end (not provably closed) -> censored
    val sess = Seq(
      (0L, 0L), (100L, 160L), (1000L, 1075L), (5000L, 5130L), (20000L, 20180L))
      .toDF("start_sec", "end_sec")
    val got = graft.operators.Events.survivalOn(sess)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (0L, 5L, 1L, 0L, 1L),
      (1L, 4L, 2L, 0L, 3L),
      (2L, 2L, 1L, 0L, 4L),
      (3L, 1L, 0L, 1L, 4L)))
    // Kaplan-Meier S(t) = prod(1 - d/n) over the table must be monotone
    // non-increasing and stay in (0, 1]
    val km = got.scanLeft(1.0) { case (s, (_, n, d, _, _)) => s * (1.0 - d.toDouble / n) }.tail
    assert(km.zip(km.tail).forall { case (a, b) => b <= a + 1e-12 })
    assert(km.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("q31_lateral: decorrelates to WindowGroupLimit, never a per-row loop") {
    val df = graft.operators.Relational.q31Lateral(spark, sfDir)
    val p = plan(df)
    // the correlated ORDER BY ... LIMIT must become a group-limit window
    // (bounded per-key state, partial before the exchange), not a nested
    // loop over customers
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
    // top-2 per customer, price-cents descending with orderkey tiebreak
    val rows = df.collect()
    val byCust = rows.groupBy(_.getLong(0))
    assert(byCust.values.forall(_.length <= 2))
    assert(byCust.values.forall { g =>
      val pcs = g.map(r => (-r.getLong(2), r.getLong(1))).toSeq
      pcs == pcs.sorted
    })
  }

  test("ta_readability: sentence term, negative-score text, bucket cuts") {
    import spark.implicits._
    val docs = Seq(
      // easy: short words, two sentences (F ~ 118)
      ("en", "The cat sat. It sat on a mat!"),
      // hard: F goes NEGATIVE — exercises the no-integer-division rule
      ("en", "incomprehensibility extraordinarily unquestionably"),
      // medium: 10 words, 17 vowel groups, one sentence (F ~ 53)
      ("fr", "data table vector stream filter merge sort window column row"))
      .toDF("lang", "text")
    val got = graft.operators.TextAnalysis.readabilityOn(docs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      ("en", "easy", 1L, 8L, 2L, 8L),
      ("en", "hard", 1L, 3L, 1L, 19L),
      ("fr", "medium", 1L, 10L, 1L, 17L)))
  }

  test("zs_cost_distance: octile route-around-friction, unreached cap") {
    import spark.implicits._
    // source (0,0) [densest]; (1,0) is high-friction: the cheap route to
    // (2,0) goes diagonally around it (14+1 + 14+1 = 30 vs 10+50+10+1 = 71);
    // (10,10) is disconnected -> unreached bucket -1
    val grid = Seq(
      (0L, 0L, 100L), (1L, 0L, 50L), (1L, 1L, 1L), (2L, 0L, 1L), (10L, 10L, 7L))
      .toDF("fx", "fy", "n")
    val got = graft.operators.Geo.costDistanceOn(grid, nSources = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (-1L, 1L, -1L, -1L),   // disconnected cell never relaxed
      (0L, 3L, 0L, 30L),     // source 0, diagonal 15, around-friction 30
      (1L, 1L, 60L, 60L)))   // the high-friction cell itself: direct 10+50
  }

  test("gr_local_cc: planted K4 clique, bridge dilution, degree-1 filter") {
    import spark.implicits._
    // K4 on {1,2,3,4}; node 5 bridges 1 and leaf 6 (degree-1, filtered out)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L), (5L, 6L)).toDF("a", "b")
    val got = graft.operators.GraphOps.localClusteringOn(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (2L, 3L, 3L, 10000L), (3L, 3L, 3L, 10000L), (4L, 3L, 3L, 10000L),
      (1L, 3L, 4L, 5000L),  // the clique node diluted by its bridge edge
      (5L, 0L, 2L, 0L)))    // wedge node: two edges, no closure
  }

  test("ta_keyphrase: RAKE deg/freq arithmetic on a hand-worked corpus") {
    import spark.implicits._
    // big/data: freq 2, deg 4 (two 2-word phrases) -> 20000
    // fast: freq 2, deg 3 (one 2-word + one 1-word phrase) -> 15000
    // sort: freq 1, deg 2 -> 20000
    val docs = Seq(
      (1L, "big data the fast sort"), (2L, "big data"), (3L, "fast"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.keyphraseOn(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("big data", 2L, 2L, 40000L),
      ("fast sort", 2L, 1L, 35000L),
      ("fast", 1L, 1L, 15000L)))
  }

  test("zs_tri: spike cell reaches the rugged band, absent neighbors are 0") {
    import spark.implicits._
    val grid = Seq(
      (0L, 0L, 100L), (1L, 0L, 2L), // spike + its foothill: both rugged
      (5L, 5L, 9L),                 // isolated: 8*9 = 72 -> intermediate
      (9L, 9L, 1L))                 // isolated: 8*1 = 8 -> level
      .toDF("fx", "fy", "n")
    val got = graft.operators.Geo.triOn(grid)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      ("intermediate", 1L, 72L, 72L, 72L),
      ("level", 1L, 8L, 8L, 8L),
      // spike: |100-2| + 7*100 = 798; foothill: |2-100| + 7*2 = 112
      ("rugged", 2L, 910L, 112L, 798L)))
  }

  test("ann_graph_search: full beams, ordered ranks, nontrivial recall") {
    val got = graft.operators.Similarity.graphSearch(spark, sfDir).collect()
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.size === 10 && byQ.values.forall(_.length === 3))
    // per query: ranks 1..3 with non-increasing cosine
    assert(byQ.values.forall { g =>
      val sorted = g.sortBy(_.getInt(1))
      sorted.map(_.getInt(1)).toSeq == Seq(1, 2, 3) &&
        sorted.sliding(2).forall(p => p(0).getDouble(3) >= p(1).getDouble(3))
    })
    // the 3-hop beam over the random 8-out graph recovers a nontrivial
    // slice of the exact top-3 (measured 9/30 at sf0.001; floor 5)
    val beam = got.map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = graft.operators.Similarity.bruteforce(spark, sfDir)
      .filter(col("rank") <= 3).select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((beam & exact).size >= 5, s"overlap=${(beam & exact).size}")
  }

  test("gr_temporal_reach: decreasing-time paths do not leak reachability") {
    import spark.implicits._
    // 0 -5-> 10 -7-> 20 -3-> 30: the 20->30 edge happened BEFORE influence
    // arrived at 20 — statically connected, temporally unreachable.
    // 0 -9-> 50 -9-> 60: equal times are non-decreasing (allowed).
    val edges = Seq(
      (0L, 10L, 5L), (10L, 20L, 7L), (20L, 30L, 3L),
      (0L, 50L, 9L), (50L, 60L, 9L)).toDF("a", "b", "hs")
    val got = graft.operators.GraphOps.temporalReachOn(edges, seedBelow = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (0L, 0L, 1L), (0L, 1L, 3L), (0L, 2L, 5L), (0L, 3L, 5L)))
  }

  test("ev_overlap_join: touching/nested/disjoint pairs, cross-cell dedup") {
    import spark.implicits._
    val sess = Seq(
      (1L, 100L, 500L),   // A
      (2L, 400L, 900L),   // B: overlaps A by 100s
      (3L, 901L, 1000L),  // C: disjoint from A and B (gap of 1s after B)
      (1L, 3000L, 8000L), // D: spans hour cells 0,1,2
      (2L, 3500L, 7400L), // E: spans the same three cells as D (dedup test)
      (3L, 7400L, 7500L)) // F: touches E exactly at one second (ov = 0)
      .toDF("user_id", "start_sec", "end_sec")
    val got = graft.operators.Events.overlapJoinOn(sess).collect()
    // pairs: (A,B,100) (D,E,3900 — counted ONCE despite 3 shared cells)
    //        (E,F,0 — touching) (D,F,100); C joins nothing
    assert(got.length === 1)
    assert((got(0).getLong(0), got(0).getLong(1), got(0).getLong(2)) === (0L, 4L, 4100L))
  }
}
