package graft

import graft.operators.{Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-7 pins: the BPE encode split (merges learned only from the train
  * slice, replayed on held-out text, zero-application rounds well-defined)
  * and the IVFPQ cascade's pruning bound.
  */
class Round7Spec extends SparkSpecBase {

  /** Hand-worked corpus: chars 1..40 = "aaaa bb cc dd" space-padded (the
    * BpeSpec training corpus — learns a+a, aa+aa, b+b, c+c), chars 41..52
    * = "aa aaaa x bb" (12 symbols).
    *  - r1 a+a: matches at pos 1 and the {4,5,6} run (parity keeps 4, 6)
    *    -> 3 applied, 9 tokens [aa,' ',aa,aa,' ',x,' ',b,b];
    *  - r2 aa+aa: one match -> 8 tokens [aa,' ',aaaa,' ',x,' ',b,b];
    *  - r3 b+b: one match -> 7 tokens;
    *  - r4 c+c: encode slice has NO c -> 0 applied, 7 tokens (the
    *    coalesce-to-0 path — and proof the pair came from the TRAIN
    *    slice, which does have cc). */
  test("bpe encode: trained merges replay on the held-out slice, zero-application round") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa bb cc dd" + " " * 27 + "aa aaaa x bb")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeEncodeOn(docs)
      .select("round", "pair", "n_applied", "tokens_after")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val expected = Seq(
      (1L, "a+a", 3L, 9L),
      (2L, "aa+aa", 1L, 8L),
      (3L, "b+b", 1L, 7L),
      (4L, "c+c", 0L, 7L))
    assert(got == expected, s"got $got")
  }

  test("bpe encode on the corpus: same merge list as train, monotone held-out tokens") {
    val trainPairs = TextAnalysis.bpeTrain(spark, sfDir)
      .select("round", "pair").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val enc = TextAnalysis.bpeEncode(spark, sfDir)
      .select("round", "pair", "n_applied", "tokens_after").collect()
    assert(enc.map(r => (r.getLong(0), r.getString(1))).toSeq == trainPairs,
      "encode must replay exactly the trained merge list, in order")
    val tokens = enc.map(_.getLong(3))
    assert(tokens.zip(tokens.tail).forall { case (a, b) => b <= a },
      s"held-out token count may never increase: ${tokens.toSeq}")
    assert(enc.forall(_.getLong(2) >= 0L))
  }

  /** Hand-worked LM corpus: ug(a)=3 transitions; cb(a,b)=2, cb(a,c)=1.
    * d1,d2 ("a b", source s1): p = 10000*2//3 = 6666; d3 ("a c", s2):
    * p = 3333. One-word docs are unscored. */
  test("lm score: conditional-probability arithmetic on a hand-worked corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", "a b"), (2L, "s1", "a b"), (3L, "s2", "a c"), (4L, "s2", "x"))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.lmScoreOn(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val expected = Seq(
      ("s1", 2L, 2L, 6666L, 6666L, 6666L),
      ("s2", 1L, 1L, 3333L, 3333L, 3333L))
    assert(got == expected, s"got $got")
  }

  /** The cascade's point is the prune: every query must have scored
    * strictly fewer candidates than the corpus (P=6 of k=10 clusters),
    * and still return a full exact-reranked top-3 drawn from the
    * approx top-10. */
  test("ivfpq: candidate set is pruned below the corpus, full top-3 per query") {
    val corpusN = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val rows = Similarity.ivfpq(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 10, s"expected 10 queries, got ${byQ.size}")
    byQ.foreach { case (qid, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L), s"qid $qid ranks")
      val nCand = rs.head.getLong(5)
      assert(nCand > 0L && nCand < corpusN - 1,
        s"qid $qid: n_cand $nCand not in (0, ${corpusN - 1}) — no prune happened")
      rs.foreach(r => assert(r.getLong(4) >= 1L && r.getLong(4) <= 10L,
        s"qid $qid: approx_rank ${r.getLong(4)} outside [1, 10]"))
    }
  }
}
