package graft

import graft.operators.GraphOps

/** Round-19 pins: the composed multi-level Louvain loop
  * (gr_louvain_full) on a hand-worked graph, levels and the
  * data-dependent early stop computed by hand. */
class Round19Spec extends SparkSpecBase {

  /** Two 4-cliques {1..4} and {5..8} bridged by (4,5) — m = 13.
    *
    * Hand-worked trace (singleton initial labels, all g values from
    * g(B) = 2m·k_in(B) − k_i·(Σtot(B) − [own]k_i)):
    *
    * Level 1 (unweighted move): in clique A, nodes 2,3,4 best-gain into
    * label 1 (g = 17/17/14 vs own 0, guard lc < la holds); node 1's best
    * (lc = 2, g = 17) fails the min-label guard and stays. In clique B,
    * 7 and 8 move to 6 (g = 17), node 6's best is 7 (guard fails, stays
    * 6), and the BRIDGE node 5's best is 6 (g = 14) — blocked by the
    * guard (6 > 5), so 5 stays singleton. P1 = {1234 | 5 | 678},
    * n_super = 3. Q: smc = 6+0+3 = 9, deg_w = (13, 4, 9), sd2 = 266,
    * q1 = floor(10000·(4·13·9 − 266 + 676)/676) − 10000 = 2988.
    *
    * Level 2 (weighted, singleton start on the super-graph with
    * k = (13, 4, 9)): node 5's best move (into 6: g = 2·13·3 − 4·9 = 42)
    * is again guard-blocked, but node 6 moves INTO 5 (g = 42 > 0,
    * 5 < 6) — the guard lets exactly one side of the symmetric swap
    * through. P2 = {1 | 5,6}, n_super = 2. intra = (6, 6),
    * deg_w = (13, 13), smc = 12, sd2 = 338, q2 = 4230. Improved → on.
    *
    * Level 3: k = (13, 13), joining costs g = 26 − 169 < 0 — identity
    * move, q3 = q2 = 4230. Plateau published, loop stops: level 4 never
    * runs even though LouvainMaxLevels = 4. */
  test("gr_louvain_full: hand-worked two-clique bridge, climb then plateau") {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (5L, 7L), (5L, 8L), (6L, 7L), (6L, 8L), (7L, 8L),
      (4L, 5L)).toDF("a", "b")
    val labels = (1L to 8L).map(u => (u, u)).toDF("u", "lbl")
    val got = GraphOps.louvainFullOn(spark, edges, labels)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got == Seq((1L, 3L, 2988L), (2L, 2L, 4230L), (3L, 2L, 4230L)),
      s"hand-worked multi-level trace diverged: $got")
  }

  /** An already-optimal partition plateaus immediately: level 2 cannot
    * improve, so exactly levels 1 and 2 publish (the unconditional
    * floor) and level 3 never runs. */
  test("gr_louvain_full: immediate plateau stops after the level-2 floor") {
    import spark.implicits._
    // two disjoint triangles — level 1 collapses each, level 2 has
    // nothing to merge (joining across components only loses Q)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),
      (11L, 12L), (11L, 13L), (12L, 13L)).toDF("a", "b")
    val labels = Seq(1L, 2L, 3L, 11L, 12L, 13L).map(u => (u, u)).toDF("u", "lbl")
    val got = GraphOps.louvainFullOn(spark, edges, labels)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1) == Seq(1L, 2L), s"expected exactly levels 1 and 2: $got")
    assert(got(0)._2 == 2L && got(1)._2 == 2L,
      s"both levels must hold the two components: $got")
    assert(got(1)._3 <= got(0)._3, s"level 2 must not improve here: $got")
  }

  /** Hand-worked ta_tok_compare: corpus "aa aa aa" → one word (aa, 3),
    * 6 chars. WordPiece vocab holds "aa" (top candidate) → 1 piece per
    * word, 3 tokens. Unigram: s(a) = bitlen(6)−4 = −1, s(aa) =
    * bitlen(3)−4 = −2; paths a+a and aa tie on score −2 and the packed
    * key prefers fewer pieces → 1 piece, 3 tokens. Char floor: 6. */
  test("ta_tok_compare: hand-worked single-word corpus") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "aa aa aa")).toDF("doc_id", "text")
    val got = TextAnalysis.tokCompareOn(docs).collect().toSeq.map(_.toSeq)
    assert(got == Seq(
      Seq("0_chars", 6L, 3L, 6L, 20000L, 10000L),
      Seq("1_wordpiece", 3L, 3L, 6L, 10000L, 20000L),
      Seq("2_unigram", 3L, 3L, 6L, 10000L, 20000L)), s"trace: $got")
  }

  /** A corpus with no [a-z]+ words used to NPE the tokenizer entry
    * points (max word length over zero words is NULL); the guarded
    * bound must yield zero DP rounds and an empty result instead. */
  test("tokenizer On variants: wordless corpus yields empty, not NPE") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "12345 !!! 67890"), (2L, "??? 42")).toDF("doc_id", "text")
    assert(TextAnalysis.wordpieceOn(docs).collect().isEmpty)
    assert(TextAnalysis.unigramOn(docs).collect().isEmpty)
    assert(TextAnalysis.unigramEmOn(docs).collect().isEmpty)
    // the compare table still publishes its three rows — all-zero, with
    // the division guards holding (never an ANSI divide-by-zero)
    val cmp = TextAnalysis.tokCompareOn(docs).collect().toSeq.map(_.toSeq)
    assert(cmp == Seq(
      Seq("0_chars", 0L, 0L, 0L, 0L, 0L),
      Seq("1_wordpiece", 0L, 0L, 0L, 0L, 0L),
      Seq("2_unigram", 0L, 0L, 0L, 0L, 0L)), s"zero table: $cmp")
  }
}
