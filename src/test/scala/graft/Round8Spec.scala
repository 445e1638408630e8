package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Round-8 operator pins: the top-V broadcast LM variant (ta_lm_topv). */
class Round8Spec extends SparkSpecBase {

  test("lm topv: closed-vocab scoring on a hand-worked corpus, OOV transitions dropped") {
    import spark.implicits._
    // unigram counts (as w1): a -> 3, b -> 1; c is never a left word.
    // top-2 vocab = {a, b}; (a,c) has an OOV right word -> doc 2 drops.
    val docs = Seq((1L, "s1", "a a b"), (2L, "s1", "a c"), (3L, "s2", "b a"))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.lmScoreTopVOn(docs, 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val expected = Seq(
      ("s1", 1L, 2L, 3333L, 3333L, 3333L),  // (a,a) + (a,b): each 10000*1 div 3
      ("s2", 1L, 1L, 10000L, 10000L, 10000L)) // (b,a): 10000*1 div 1
    assert(got == expected, s"got $got")
  }

  test("lm topv: shrinking the cap drops tail-vocab transitions") {
    import spark.implicits._
    val docs = Seq((1L, "s1", "a a b"), (2L, "s1", "a c"), (3L, "s2", "b a"))
      .toDF("doc_id", "source", "text")
    // vocab = {a} only: (a,b)/(b,a) now OOV; only (a,a) scores
    val got = TextAnalysis.lmScoreTopVOn(docs, 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(("s1", 1L, 1L, 3333L)), s"got $got")
  }

  test("lm topv plan: scoring joins are ALL broadcast — the corpus never shuffles on word keys") {
    // the skew posture: a hot unigram (stopword) can overload one reducer
    // in a co-partitioned count join; the broadcast-model plan has no
    // shuffle join at all, so the hot key never routes through an exchange
    val p = plan(TextAnalysis.lmScoreTopV(spark, sfDir))
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("ShuffledHashJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("lm topv on the corpus: head-vocab scores dominate the uncapped model's range") {
    // sanity on real data: the capped model scores a subset of transitions
    // (n_transitions <= uncapped) and every per-source aggregate stays in
    // the scaled-integer range [0, 10000]
    val topv = TextAnalysis.lmScoreTopV(spark, sfDir).collect()
    val full = TextAnalysis.lmScore(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(topv.nonEmpty)
    topv.foreach { r =>
      val src = r.getString(0)
      assert(r.getLong(2) <= full.getOrElse(src, 0L),
        s"$src: capped model scored MORE transitions than the full model")
      Seq(3, 4, 5).foreach(i =>
        assert(r.getLong(i) >= 0L && r.getLong(i) <= 10000L,
          s"$src: column $i out of [0, 10000]: ${r.getLong(i)}"))
    }
  }
}
