package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Pins ta_bpe_train's three deterministic rules on a hand-computed
  * corpus, independent of the DuckDB oracle (which runs the same unroll —
  * this spec is the against-paper check).
  *
  * Corpus "aaaa bb cc dd", worked by hand:
  *  - round 1: (a,a) counted at pos 1,2,3 (n_pair 3); the run {1,2,3} is
  *    consecutive, run-parity merges pos 1 and pos 3 (leftmost-greedy:
  *    "aaaa" -> "aa","aa", never the overlapping middle pair) -> 2 merges,
  *    13 - 2 = 11 tokens;
  *  - round 2: four pairs all count 1 — the tie-break is lexicographic,
  *    and "aa" < "b" < "c" < "d", so (aa,aa) wins -> 10 tokens;
  *  - rounds 3-4: (b,b) then (c,c) -> 9, 8 tokens. Pairs touching the
  *    space symbol are never counted (word-boundary blocking), which is
  *    why " b" / "b " never appear despite counting 1 each.
  */
class BpeSpec extends SparkSpecBase {

  test("bpe merge training: boundary blocking, lexicographic ties, run-parity overlaps") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa bb cc dd")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrainOn(docs)
      .select("round", "pair", "n_pair", "n_merged", "tokens_after")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    val expected = Seq(
      (1L, "a+a", 3L, 2L, 11L),
      (2L, "aa+aa", 1L, 1L, 10L),
      (3L, "b+b", 1L, 1L, 9L),
      (4L, "c+c", 1L, 1L, 8L))
    assert(got == expected, s"got $got")
  }

  test("bpe on the corpus: token count strictly decreases, merges bounded by pair count") {
    val rows = TextAnalysis.bpeTrain(spark, sfDir)
      .select("round", "n_pair", "n_merged", "tokens_after").collect()
    assert(rows.length == TextAnalysis.BpeRounds)
    rows.foreach { r =>
      assert(r.getLong(2) >= 1L && r.getLong(2) <= r.getLong(1),
        s"round ${r.getLong(0)}: merges ${r.getLong(2)} outside [1, ${r.getLong(1)}]")
    }
    val tokens = rows.map(_.getLong(3))
    assert(tokens.zip(tokens.tail).forall { case (a, b) => b < a },
      s"token counts not strictly decreasing: ${tokens.toSeq}")
  }
}
