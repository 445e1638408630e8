package graft

import graft.operators.{Dedup, Events, GraphOps, TextAnalysis}
import graft.sources.ManifestIO
import org.apache.spark.sql.functions._

/** Round-10 operator pins: maximal duplicated-span extraction
  * (dd_span_extract), sliding-window retrieval chunking (ta_chunk), and
  * exact sliding-window distinct users (ev_sliding_distinct). */
class Round10Spec extends SparkSpecBase {

  test("span_extract: runs merge, singletons stay, unique spans vanish") {
    import spark.implicits._
    // 2-word spans. doc 0: spans (a b)(c d)(e f)(x x) — (a b),(c d) match
    // doc 1 and (e f) matches doc 2; all three are CONSECUTIVE so they
    // merge into one island regardless of which doc they matched. (x x)
    // is unique -> absent. Doc 0's second occurrence pattern also pins
    // that a run may mix match sources.
    val docs = Seq(
      (0L, "a b c d e f x x"),
      (1L, "a b c d q q"),
      (2L, "p p e f")).toDF("doc_id", "text")
    val out = Dedup.spanExtractOn(docs, spanWords = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, 0L, 3L, 6L), // doc 0: words 0..5 = merged (a b)(c d)(e f) run
      (1L, 0L, 2L, 4L), // doc 1: the shared (a b)(c d) run
      (2L, 2L, 1L, 2L))) // doc 2: (e f) at words 2..3; (p p) unique -> out
  }

  test("span_extract: within-doc repetition alone counts as duplicated") {
    import spark.implicits._
    // (z z) occurs twice inside one doc -> df = 2 -> both spans flagged,
    // adjacent -> one island covering the whole doc.
    val docs = Seq((7L, "z z z z")).toDF("doc_id", "text")
    val out = Dedup.spanExtractOn(docs, spanWords = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((7L, 0L, 2L, 4L)))
  }

  test("chunk: exact-fit, one-past, short, and overlap boundary shapes") {
    import spark.implicits._
    val w = (1 to 65).map(i => s"w$i")
    val docs = Seq(
      (0L, w.take(64).mkString(" ")), // exactly ChunkLen -> 1 chunk
      (1L, w.take(65).mkString(" ")), // one past -> 2 chunks, tail width 17
      (2L, "a b c")).toDF("doc_id", "text") // short -> 1 clamped chunk
    val out = TextAnalysis.chunkOn(docs, 64L, 48L)
      .select("doc_id", "chunk_idx", "start_word", "n_chunk_words").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, 0L, 0L, 64L),
      (1L, 0L, 0L, 64L), (1L, 1L, 48L, 17L),
      (2L, 0L, 0L, 3L)))
  }

  test("chunk: overlapping windows share the overlap words (md5 check)") {
    import spark.implicits._
    val words = (1 to 65).map(i => s"w$i")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.chunkOn(docs, 64L, 48L)
      .orderBy("chunk_idx").select("chunk_md5").as[String].collect()
    val exp0 = java.security.MessageDigest.getInstance("MD5")
      .digest(words.take(64).mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val exp1 = java.security.MessageDigest.getInstance("MD5")
      .digest(words.slice(48, 65).mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out.toSeq == Seq(exp0, exp1))
  }

  test("winnow: matches an independent imperative winnowing of the corpus") {
    import spark.implicits._
    def md5hex8(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    // Deterministic word soup with planted overlap: docs 0 and 1 share an
    // 8-word run (several shared grams), doc 2 is disjoint.
    val t0 = "the quick brown fox jumps over the lazy dog again and again today"
    val t1 = "start pad quick brown fox jumps over the lazy dog end marker word"
    val t2 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq((0L, t0), (1L, t1), (2L, t2)).toDF("doc_id", "text")
    // Imperative reference: k=4-word grams, w=4 windows, min by (hash asc,
    // pos desc), distinct selections.
    val expected = Seq((0L, t0), (1L, t1), (2L, t2)).map { case (id, t) =>
      val ws = t.split(" ")
      val hs = (0 to ws.length - 4).map(p => (md5hex8(ws.slice(p, p + 4).mkString(" ")), p))
      val sel = (0 to hs.length - 4).map { s =>
        hs.slice(s, s + 4).minBy { case (h, p) => (h, -p) }
      }.distinct
      id -> (hs.length - 3, sel)
    }.toMap
    val shared = expected.toSeq.flatMap { case (id, (_, sel)) =>
      sel.map(f => (id, f._1)) }.distinct
      .groupBy(_._2).view.mapValues(_.size).toMap
    val out = Dedup.winnowOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    expected.foreach { case (id, (nWin, sel)) =>
      val nShared = sel.count(f => shared(f._1) >= 2)
      assert(out(id) == ((nWin.toLong, sel.size.toLong,
        sel.size.toLong * 10000 / nWin, nShared.toLong)), s"doc $id")
    }
    // the planted overlap must actually be detected
    assert(out(0L)._4 > 0 && out(1L)._4 > 0 && out(2L)._4 == 0L)
  }

  test("kanon: anonymity classes and risk users on a hand-built frame") {
    import spark.implicits._
    // One QI combo per (type, k-bucket, hour). Type "a", kb 0, hour 0:
    // users 1..5 (anonymous). Type "a", kb 1, hour 0: user 6 alone
    // (singleton). Type "b", kb 0, hour 0: users 7,8 (low) — user 7 also
    // fires a DUPLICATE event in the same combo (dedup must not double
    // count).
    val base = 3600L * 400000
    def ev(t: String, k: Int, u: Long) =
      (t, s"""{"k": $k}""", base, u)
    val rows = (1L to 5L).map(u => ev("a", 5, u)) ++
      Seq(ev("a", 15, 6L), ev("b", 5, 7L), ev("b", 5, 7L), ev("b", 7, 8L))
    val events = rows.toDF("event_type", "props", "sec", "user_id")
      .select(col("event_type"), col("props"),
        timestamp_seconds(col("sec")).as("ts"), col("user_id"))
    val out = ManifestIO.kanonOn(events).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out("a") == ((2L, 1L, 0L, 1L, 1L))) // 2 combos: 1 anon, 1 singleton; user 6 at risk
    assert(out("b") == ((1L, 0L, 1L, 0L, 2L))) // users 7,8 share a 2-user combo
  }

  test("markov: transition counts and scaled conditional probabilities") {
    import spark.implicits._
    // user 1: a b a b -> (a,b) x2, (b,a) x1; user 2: a c -> (a,c) x1.
    // from a: tot 3 -> p(b)=6666, p(c)=3333; from b: tot 1 -> p(a)=10000.
    val base = 3600L * 300000
    val ev = Seq(
      (1L, base + 1, 10L, "a"), (1L, base + 2, 11L, "b"),
      (1L, base + 3, 12L, "a"), (1L, base + 4, 13L, "b"),
      (2L, base + 1, 20L, "a"), (2L, base + 2, 21L, "c"))
      .toDF("user_id", "sec", "event_id", "event_type")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"),
        col("event_id"), col("event_type"))
    val out = Events.markovOn(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(out == Map(
      ("a", "b") -> ((2L, 6666L)),
      ("a", "c") -> ((1L, 3333L)),
      ("b", "a") -> ((1L, 10000L))))
  }

  test("markov: same-second events order by event_id, not arrival") {
    import spark.implicits._
    val base = 3600L * 300000
    // both events in the same second; event_id 5 precedes 6 -> (p, q).
    val ev = Seq((1L, base, 6L, "q"), (1L, base, 5L, "p"))
      .toDF("user_id", "sec", "event_id", "event_type")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"),
        col("event_id"), col("event_type"))
    val out = Events.markovOn(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("p", "q", 1L)))
  }

  test("merge: audit rows reconcile with the landed post-merge table") {
    val audit = ManifestIO.mergeQuery(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(audit.keys.map(_._2).toSet == Set("insert", "keep", "update", "delete"))
    val nOrders = graft.sources.Tables.orders(spark, sfDir).count()
    val nDeleted = audit.collect { case ((_, "delete"), n) => n }.sum
    val nInserted = audit.collect { case ((_, "insert"), n) => n }.sum
    val landedTotal = audit.collect { case ((_, a), n) if a != "delete" => n }.sum
    assert(landedTotal == nOrders - nDeleted + nInserted)
    // inserts always land under the sentinel status
    assert(audit.keys.collect { case (s, "insert") => s }.toSet == Set("N"))
  }

  test("sssp: relaxation beats the direct edge; 4-round bound leaves the tail") {
    import spark.implicits._
    // Seeds are u % 100 == 0 (nodes 0 and 300). Two-hop path 0-1-2 (cost
    // 2) must beat the direct 0-2 edge (cost 5); the 5-hop unit chain
    // 0-11-..-15 leaves node 15 unreached after 4 rounds.
    val edges = Seq(
      (0L, 1L, 1L), (1L, 2L, 1L), (0L, 2L, 5L), (2L, 3L, 10L),
      (300L, 4L, 2L), (0L, 11L, 1L), (11L, 12L, 1L), (12L, 13L, 1L),
      (13L, 14L, 1L), (14L, 15L, 1L)).toDF("a", "b", "w")
    val sym = edges.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .unionByName(edges.select(col("b").as("src"), col("a").as("dst"), col("w")))
    val out = GraphOps.ssspOn(sym).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(-1L -> 1L, 0L -> 2L, 1L -> 2L, 2L -> 3L,
      3L -> 1L, 4L -> 1L, 12L -> 1L))
  }

  test("dedup funnel: every stage drops its planted duplicate class") {
    import spark.implicits._
    // d0 = 60-word base. d1 = d0 with case noise + trailing spaces (stage
    // 2 victim: normalizes identically). d2 = d0 with the last 6 words
    // changed (stage 3 victim: near-identical shingle set, signatures
    // agree). d3 = d0's first 20 words (stage 4 victim: both of its
    // 10-word spans duplicate d0's, but only ~18/58 shingle overlap so
    // minhash misses it; d0 itself keeps dup 2/6 = 3333 < 5000 and
    // survives). d4 = disjoint clean doc.
    val w = (1 to 60).map(i => s"tok$i")
    val d0 = w.mkString(" ")
    val d1 = d0.replace("tok1 ", "TOK1 ") + "  "
    val d2 = (w.take(54) ++ (1 to 6).map(i => s"x$i")).mkString(" ")
    val d3 = w.take(20).mkString(" ")
    val d4 = (1 to 60).map(i => s"other$i").mkString(" ")
    val docs = Seq((0L, d0), (1L, d1), (2L, d2), (3L, d3), (4L, d4))
      .toDF("doc_id", "text")
    val out = Dedup.dedupFunnelOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out == Map(
      1L -> (("input", 5L)), 2L -> (("norm_exact", 4L)),
      3L -> (("minhash_neardup", 3L)), 4L -> (("span_clean", 2L))),
      s"got $out")
  }

  test("kcore: peeling cascades below k and fixes on the true core") {
    import spark.implicits._
    // K4 clique on 1..4 (the 3-core) + node 5 at deg 3 via two leaves
    // (6, 7). Round 1 peels only the leaves (5 still has deg 3), which
    // CASCADES: round 2 sees 5 at deg 1 and peels it; rounds 3-4 are the
    // fixed point.
    val clique = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = (clique ++ Seq((4L, 5L), (5L, 6L), (5L, 7L))).toDF("a", "b")
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(edges.select(col("b").as("src"), col("a").as("dst")))
    val out = GraphOps.kcoreOn(sym).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 5L, 14L), (2L, 4L, 12L),
      (3L, 4L, 12L), (4L, 4L, 12L)), s"got ${out.toSeq}")
  }

  test("cdf: every change type is live and pre/post images pair exactly") {
    val out = ManifestIO.cdfQuery(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byType = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(Set("insert", "delete", "update_pre", "update_post")
      .subsetOf(byType.keySet), s"got $byType")
    assert(byType("update_pre") == byType("update_post"))
    // pre/post pair on the same key, and the post image moved by the
    // versioned delta (+1, +2, or +3 for keys hit at both v2 and v3)
    val pre = out.filter(_._2 == "update_pre").map(t => t._1 -> t._3).toMap
    val post = out.filter(_._2 == "update_post").map(t => t._1 -> t._3).toMap
    assert(pre.keySet == post.keySet)
    pre.foreach { case (k, p) =>
      val d = post(k) - p
      assert(d > 0.5 && d < 3.5, s"key $k delta $d")
    }
    // inserts are exactly the negative synthetic keys
    assert(out.filter(_._2 == "insert").forall(_._1 < 0))
  }

  test("scene_cut: scene lengths conserve the frame count") {
    val out = graft.operators.Multimodal.sceneCut(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nf, ns, longest) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ns >= 1 && longest >= 1 && longest <= nf && ns <= nf,
        s"doc ${r.getLong(0)}: frames $nf scenes $ns longest $longest")
      // ceil(nf / ns) <= longest: the longest scene must cover the mean
      assert(longest >= (nf + ns - 1) / ns)
    }
  }

  test("pair_mine: negatives are in-corpus and never collide with the pair") {
    val out = Dedup.pairMine(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty, "no verified pairs at sf0.001 — corpus assumption broken")
    val ids = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    out.foreach { case (a, p, n, m) =>
      assert(m >= 9L && a < p, s"pair ($a,$p) agree $m")
      assert(ids(n) && n != a && n != p, s"negative $n collides for ($a,$p)")
    }
  }

  test("sliding_distinct: dedup within a window, double-count across hops") {
    import spark.implicits._
    // Window 1h, hop 30m. User 1 fires twice at :05 and :10 (same two
    // windows -> counted once per window); user 2 fires at :40 (windows
    // :00 and :30). Expect window -30m:{1}, :00:{1,2}, :30:{2}.
    val base = 3600L * 500000 // far from epoch edge, whole-hour aligned
    val ev = Seq(
      (1L, base + 300L), (1L, base + 600L), (2L, base + 2400L))
      .toDF("user_id", "sec")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"))
    val out = ev
      .select(window(col("ts"), "1 hour", "30 minutes").as("win"), col("user_id"))
      .select(unix_timestamp(col("win.start")).as("win_start"), col("user_id"))
      .distinct().groupBy("win_start").agg(count(lit(1)).as("n_users"))
      .orderBy("win_start").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq(
      (base - 1800L, 1L), (base, 2L), (base + 1800L, 1L)))
  }
}
