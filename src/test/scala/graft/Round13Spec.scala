package graft

import org.apache.spark.sql.functions._

/** Round-9 additions: contour semantics on a hand-built grid, and the
  * accounting invariants of the ANN serving capstone + tier comparison
  * (the oracle hash-matches the VALUES; these pin the INVARIANTS a
  * reader relies on). */
class Round13Spec extends SparkSpecBase {

  test("contour: segments straddle the level between occupied cells only") {
    import spark.implicits._
    // 1-row step grid: counts 1,1,3,3,7 along y=0, plus an isolated cell
    // at (10,10) with n=7 (no neighbors -> contributes to area, never to
    // segments). Adjacent pairs: (1,1) (1,3) (3,3) (3,7).
    //  L=2: pairs straddling = (1,3),(3,7)? no - (3,7) has min 3 >= 2 -> only (1,3). area n>=2: 3,3,7,7 = 4
    //  L=5: straddle = (3,7) -> 1.       area n>=5: 7,7 = 2
    //  L=10/20: none straddle, area 0
    val cells = Seq(
      (0L, 0L, 1L), (1L, 0L, 1L), (2L, 0L, 3L), (3L, 0L, 3L), (4L, 0L, 7L),
      (10L, 10L, 7L)).toDF("fx", "fy", "n")
    val got = graft.operators.Geo.contourOn(cells).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((2L, 1L, 4L), (5L, 1L, 2L), (10L, 0L, 0L), (20L, 0L, 0L)),
      s"got $got")
  }

  test("pipe_ann: per-stage accounting holds its structural invariants") {
    val rows = graft.operators.Similarity.pipeAnn(spark, sfDir).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    val (nVec, dim) = rows("embed")
    assert(dim == 64L)
    // every vector lands in exactly one posting list
    assert(rows("index")._1 == nVec)
    // the hottest posting list cannot exceed the corpus
    assert(rows("index")._2 <= nVec)
    // the multi-probe prune scans strictly less than the brute-force set
    assert(rows("serve")._1 < rows("eval")._1 * (nVec - 1),
      "serve candidates must be a strict subset of queries x (corpus-1)")
    // hits are bounded by the exact set
    assert(rows("eval")._2 <= rows("eval")._1 * 3)
  }

  test("tier compare: brute anchors the frontier at recall 1") {
    val rows = graft.operators.Similarity.tierCompare(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(4))).toMap
    assert(rows("1_brute")._2 == 10000L, "brute force must have recall 1")
    // every pruned tier scans strictly fewer candidates than brute
    for (t <- Seq("2_lsh", "3_ivf", "4_multiprobe"))
      assert(rows(t)._1 < rows("1_brute")._1, s"$t must prune")
  }
}
