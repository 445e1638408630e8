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

  test("ev_concurrency: a third (hour) prefix level reproduces the day peaks") {
    // the 100 TB sub-bucket note made concrete: partition the running sum
    // by HOUR instead of day, carry in the cumulative hour totals, and
    // the per-day peaks must come out identical — the extra prefix level
    // bounds window fan-in at one hour's deltas without changing results.
    import org.apache.spark.sql.expressions.Window
    val s = graft.operators.Events.sessionize(spark, sfDir)
    val d = s.select(col("start_sec").as("t"), lit(1L).as("dl"),
        col("user_id"), col("session_idx"))
      .unionByName(s.select((col("end_sec") + 1L).as("t"), lit(-1L).as("dl"),
        col("user_id"), col("session_idx")))
      .withColumn("hr", expr("t div 3600"))
      .localCheckpoint()
    val wh = Window.orderBy("hr").rowsBetween(Window.unboundedPreceding, -1)
    val carry = d.groupBy("hr").agg(sum(col("dl")).as("tot"))
      .withColumn("carry", coalesce(sum(col("tot")).over(wh), lit(0L)))
      .select("hr", "carry")
    val wrh = Window.partitionBy("hr")
      .orderBy(col("t").asc, col("dl").asc, col("user_id").asc, col("session_idx").asc)
    val run = d.withColumn("rs", sum(col("dl")).over(wrh))
      .join(broadcast(carry), Seq("hr"))
      .withColumn("conc", col("rs") + col("carry"))
      .withColumn("day", expr("t div 86400"))
    val peaks3 = run
      .withColumn("mx", max(col("conc")).over(Window.partitionBy("day")))
      .filter(col("conc") === col("mx"))
      .groupBy("day")
      .agg(max(col("conc")).as("peak_concurrency"), min(col("t")).as("peak_sec"))
    val prod = graft.operators.Events.concurrency(spark, sfDir)
      .select("day", "peak_concurrency", "peak_sec")
    assert(peaks3.exceptAll(prod).isEmpty && prod.exceptAll(peaks3).isEmpty,
      "hour-level prefix sums must reproduce the day-level peaks exactly")
  }

  test("ann_delete: tombstoned rows never serve; compaction preserves results") {
    val rows = graft.operators.Similarity.annDelete(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (live, tomb, served, matched) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // the online invariant: every post-compaction triple matches the
      // tombstone-filtered serve over the full index
      assert(matched == served, s"cell ${r.getString(0)}: parity $matched != served $served")
      assert(live >= 0 && tomb >= 0)
    }
    // the tombstone batch is ~1/DeleteModulus of the corpus
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val tombs = rows.map(_.getLong(2)).sum
    assert(tombs == (0L until total).count(v => v % graft.operators.Similarity.DeleteModulus == 3L),
      "tombstone count must equal the modulus batch over dense ids")
  }

  test("q29_pit_features: nothing at or after the purchase instant leaks in") {
    val rows = graft.operators.AsofJoin.pitFeatures(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (pSec, sessEv, sessEnd) = (r.getLong(2), r.getLong(5), r.getLong(6))
      assert(sessEnd < pSec, s"event ${r.getLong(0)}: closed session ends at/after purchase")
      assert((sessEv == 0L) == (sessEnd == -1L), "sentinel pair must agree")
      assert(r.getLong(3) >= 0 && r.getLong(4) >= 0)
    }
  }

  test("mm_epoch_shuffle: epochs cover the corpus; reshuffle decorrelates") {
    val rows = graft.operators.Multimodal.epochShuffle(spark, sfDir).collect()
    val n = graft.sources.Tables.documents(spark, sfDir).count()
    val byEpoch = rows.groupBy(_.getLong(0))
    assert(byEpoch.keySet == (0L until graft.operators.Multimodal.ShuffleEpochs).toSet)
    for ((ep, rs) <- byEpoch) {
      assert(rs.map(_.getLong(2)).sum == n, s"epoch $ep does not cover the corpus")
      val carry = rs.map(_.getLong(4)).sum
      if (ep == 0L) assert(carry == 0, "epoch 0 has no previous epoch")
      else assert(carry < n / 4, // expected n/shards = n/8 for a healthy seed
        s"epoch $ep carryover $carry of $n — permutation is not fresh")
    }
  }

  test("ann_hard_negatives: 3 ranked negatives per query, exclusions counted") {
    val rows = graft.operators.Similarity.hardNegatives(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 10)
    for ((q, rs) <- byQ) {
      assert(rs.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L), s"qid $q ranks")
      assert(rs.map(_.getLong(3)).distinct.length == 1, s"qid $q n_excluded varies")
    }
  }

  test("ev_reservoir: native bottom-k matches the rank-window formulation") {
    import org.apache.spark.sql.expressions.Window
    val rows = graft.operators.Events.reservoir(spark, sfDir)
    val h = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .withColumn("hv", expr(
        "CAST(conv(substring(md5(concat('rv:', CAST(event_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"))
    val w = Window.partitionBy("user_id").orderBy(col("hv").asc, col("event_id").asc)
    val cnts = h.groupBy("user_id").agg(count(lit(1)).as("n_user_events"))
    val declarative = h.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= graft.operators.Events.ReservoirK)
      .join(cnts, Seq("user_id"))
      .select("user_id", "sample_rank", "event_id", "event_type", "n_user_events")
    assert(rows.exceptAll(declarative).isEmpty && declarative.exceptAll(rows).isEmpty)
  }

  test("gr_modularity: per-community stats are internally consistent") {
    val rows = graft.operators.GraphOps.modularity(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val q = rows.map(_.getLong(4)).distinct
    assert(q.length == 1, "global Q must ride every row identically")
    assert(q(0) >= -10000 && q(0) <= 10000)
    for (r <- rows) {
      // intra edges contribute 2 degree-endpoints inside the community
      assert(2 * r.getLong(3) <= r.getLong(2),
        s"community ${r.getLong(0)}: intra ${r.getLong(3)} vs dsum ${r.getLong(2)}")
      assert(r.getLong(1) >= 1)
    }
  }

  test("ta_split: exact duplicates never straddle splits; shares sum per lang") {
    import spark.implicits._
    // planted exact-dup pair (same text, different lang/doc) + real corpus
    val planted = Seq(
      (900001L, "the same text twice", "en", "webA", 19),
      (900002L, "the same text twice", "fr", "webB", 19)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .unionByName(planted)
    val assigned = graft.operators.TextAnalysis.splitDocs(docs).localCheckpoint()
    // every dup group gets exactly one split (assignment is f(gk))
    val straddlers = assigned.groupBy("gk")
      .agg(countDistinct("split").as("ns")).filter(col("ns") > 1).count()
    assert(straddlers == 0)
    assert(assigned.filter(col("doc_id") === 900001L).select("split").collect()(0) ==
      assigned.filter(col("doc_id") === 900002L).select("split").collect()(0))
    // the published rollup's shares cover each lang to within floor error
    val rows = graft.operators.TextAnalysis.splitAssign(spark, sfDir).collect()
    val byLang = rows.groupBy(_.getString(0))
    for ((lang, rs) <- byLang) {
      val shareSum = rs.map(_.getLong(5)).sum
      assert(shareSum >= 10000 - rs.length && shareSum <= 10000,
        s"$lang shares sum to $shareSum")
      assert(rs.map(_.getString(1)).toSet.subsetOf(Set("train", "val", "test")))
    }
  }

  test("io_skew_profile: shares are consistent and bounded") {
    val rows = graft.sources.ManifestIO.skewProfileQuery(spark, sfDir).collect()
    assert(rows.length == 6)
    for (r <- rows) {
      val (nRows, nKeys, mx, t10) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nKeys >= 1 && nKeys <= nRows)
      assert(mx <= t10 && t10 <= nRows)
      assert(r.getLong(5) >= 0 && r.getLong(5) <= 10000)
      assert(r.getLong(6) >= r.getLong(5) && r.getLong(6) <= 10000)
      // the hint agrees with its own published numbers
      assert(r.getBoolean(7) == (mx > (nRows * 10) / nKeys))
    }
  }

  test("ann_refresh: one refresh round never worsens total distortion") {
    val rows = graft.operators.Similarity.annRefresh(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nStale = rows.map(_.getLong(1)).sum
    val nFresh = rows.map(_.getLong(3)).sum
    assert(nStale == nFresh, "both assignments cover the full corpus")
    val moved = rows.map(_.getLong(5)).sum
    assert(moved >= 0 && moved <= nStale)
    // Lloyd guarantee on the exact objective; each reported inertia is a
    // per-vector floor, so allow the accumulated floor error (< 1/vector)
    val iStale = rows.map(_.getLong(2)).sum
    val iFresh = rows.map(_.getLong(4)).sum
    assert(iFresh <= iStale + nStale,
      s"refresh worsened distortion: $iFresh > $iStale + $nStale")
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
