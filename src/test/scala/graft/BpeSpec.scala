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

  test("bpe encode: merges learned on chars 1..40 replay on the held-out 41..80 slice") {
    import spark.implicits._
    // train slice = "aaaa bb cc dd" + 27 pad spaces (space pairs are
    // boundary-blocked, so padding changes no learned pair); held-out
    // slice = "aabb aaaa cc" (12 symbols), worked by hand:
    //  r1 a+a:   pos1-2 and the {6,7,8} run (parity keeps 6 and 8) -> 3
    //            applied, 12-3 = 9 tokens
    //  r2 aa+aa: the merged "aaaa" tail -> 1 applied, 8 tokens
    //  r3 b+b / r4 c+c: 1 applied each -> 7, 6 tokens
    val docs = Seq((1L, "aaaa bb cc dd" + " " * 27 + "aabb aaaa cc"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeEncodeOn(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val expected = Seq(
      (1L, "a+a", 3L, 9L),
      (2L, "aa+aa", 1L, 8L),
      (3L, "b+b", 1L, 7L),
      (4L, "c+c", 1L, 6L))
    assert(got == expected, s"got $got")
  }

  /** The barriered fold formulation bpeEncodeOn replaced (checkpointed
    * broadcast-join apply per round, stat aggregates crossJoined off the
    * flagged frames) — kept here as the reference the barrier-free
    * count-delta plan must match row-for-row. */
  private def bpeEncodeFoldReference(docs: org.apache.spark.sql.DataFrame) = {
    def apply(wn: org.apache.spark.sql.DataFrame, best: org.apache.spark.sql.DataFrame) = {
      val flagged = TextAnalysis
        .bpeFlag(wn.crossJoin(broadcast(best)), col("bl"), col("br"))
        .localCheckpoint()
      (flagged, TextAnalysis.bpeMergeOf(flagged))
    }
    val init = (TextAnalysis.bpeBase(docs, 1).localCheckpoint(),
      TextAnalysis.bpeBase(docs, 41).localCheckpoint(),
      Seq.empty[org.apache.spark.sql.DataFrame])
    val (_, _, stats) = (1 to TextAnalysis.BpeRounds).foldLeft(init) {
      case ((trainSyms, encSyms, acc), round) =>
        val wnT = TextAnalysis.bpeWithNext(trainSyms)
        val best = TextAnalysis.bpeBest(wnT).localCheckpoint()
        val (_, mgT) = apply(wnT, best)
        val (flE, mgE) = apply(TextAnalysis.bpeWithNext(encSyms), best)
        val stat = best
          .crossJoin(flE.agg(coalesce(
            sum(when(col("mg"), 1L).otherwise(0L)), lit(0L)).as("n_applied")))
          .crossJoin(mgE.agg(count(lit(1)).as("tokens_after")))
          .select(lit(round.toLong).as("round"),
            concat(col("bl"), lit("+"), col("br")).as("pair"),
            col("n_applied"), col("tokens_after"))
        (mgT, mgE, acc :+ stat)
    }
    stats.reduce(_ unionByName _).orderBy("round")
  }

  test("barrier-free encode equals the barriered fold formulation on the corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val fast = TextAnalysis.bpeEncodeOn(docs).collect().toSeq
    val ref = bpeEncodeFoldReference(docs).collect().toSeq
    assert(fast == ref, s"barrier-free: $fast\nfold: $ref")
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
