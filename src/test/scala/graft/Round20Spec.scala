package graft

import org.apache.spark.sql.functions._
import graft.operators.{Geo, GraphOps, Relational, TextAnalysis}
import graft.sources.ManifestIO

/** Round-20 pins: the Zipf integer slope, the raster buffer disk, the
  * k-RR LDP roundtrip, the link-prediction evaluation harness, and the
  * salted-join semantics guarantee. The md5-coin operators (ldp,
  * linkpred_eval) are checked against an INDEPENDENT JVM MessageDigest
  * recomputation — same function, different implementation path. */
class Round20Spec extends SparkSpecBase {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // -- ta_zipf ---------------------------------------------------------

  /** freqs a=8 b=4 c=4 d=2 e=2 f=1 g=1 h=1 i=1; ranks 1..9 by (freq
    * desc, word). x = bitlen(rank) = 1,2,2,3,3,3,3,4,4 (sx 25); y =
    * bitlen(freq) = 4,3,3,2,2,1,1,1,1 (sy 18); sxy 42, sxx 77, n 9.
    * num = 9*42 - 25*18 = -72, den = 9*77 - 625 = 68, slope_x10000 =
    * -(720000 div 68) = -10588. */
  test("ta_zipf: hand-worked integer least-squares slope and octaves") {
    import spark.implicits._
    val docs = Seq(
      ("a a a a a a a a b b b b c c c c d d e e f g h i")).toDF("text")
    val got = TextAnalysis.zipfOn(docs).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == Seq(
      (1L, 1L, 8L, 8L, 8L, -10588L),
      (2L, 2L, 8L, 4L, 4L, -10588L),
      (3L, 4L, 6L, 1L, 2L, -10588L),
      (4L, 2L, 2L, 1L, 1L, -10588L)),
      s"hand-worked zipf table diverged: $got")
  }

  // -- zs_buffer -------------------------------------------------------

  test("zs_buffer: cell-centered disk is 3x3; band clip cuts the corner") {
    import spark.implicits._
    // interior point AT a cell center: own cell d=0, rook cells d=100,
    // diagonal d^2=20000 <= 22500 — all in; distance-200 centers out.
    val interior = Seq(("t", 17050L, 3550L)).toDF("event_type", "slon", "slat")
    val gi = Geo.bufferOn(interior).collect()
    assert(gi.length == 1 && gi(0).getLong(1) == 9L,
      s"interior centered point must dissolve to 9 cells: ${gi.toSeq}")
    // corner point at (50, 50): the 3x3 disk loses cx=-1 and cy=-1 to
    // the band clip — 4 cells survive.
    val corner = Seq(("t", 50L, 50L)).toDF("event_type", "slon", "slat")
    val gc = Geo.bufferOn(corner).collect()
    assert(gc(0).getLong(1) == 4L, s"corner clip must leave 4 cells: ${gc.toSeq}")
  }

  test("zs_buffer: overlapping disks dissolve (union, not sum)") {
    import spark.implicits._
    val two = Seq(("t", 17050L, 3550L), ("t", 17150L, 3550L))
      .toDF("event_type", "slon", "slat")
    val g = Geo.bufferOn(two).collect()
    // two adjacent 3x3 blocks share a 3x2 overlap: 9 + 9 - 6 = 12
    assert(g(0).getLong(1) == 12L && g(0).getLong(4) == 2L,
      s"dissolved union of adjacent disks must be 12 cells / 2 points: ${g.toSeq}")
  }

  // -- io_ldp ----------------------------------------------------------

  test("io_ldp: K=1 taxonomy is noise-free (replacement = truth)") {
    import spark.implicits._
    val ev = (1L to 40L).map(i => (i, "only")).toDF("event_id", "event_type")
    val g = ManifestIO.ldpOn(ev).collect()
    assert(g.length == 1)
    val r = g(0)
    assert(r.getLong(1) == 40L && r.getLong(2) == 40L,
      s"K=1: every report is the true type: $r")
    assert(r.getLong(3) == 400000L && r.getLong(4) == 0L,
      s"K=1 estimate must be exact (est 40*10000, err 0): $r")
    assert(r.getLong(5) == 4L, s"exp_eps must be 1 + 3K = 4: $r")
  }

  test("io_ldp: randomized counts match an independent MD5 replay") {
    import spark.implicits._
    val types = Vector("alpha", "beta") // vocab order = sorted
    val ids = 1L to 200L
    val ev = ids.map(i => (i, types((i % 2).toInt))).toDF("event_id", "event_type")
    // independent replay of the mechanism with java MessageDigest
    val obs = scala.collection.mutable.Map("alpha" -> 0L, "beta" -> 0L)
    ids.foreach { i =>
      val t = types((i % 2).toInt)
      val mh = md5hex(s"ldp:$i")
      val c = Integer.parseInt(mh.substring(0, 1), 16) % 4
      val ridx = java.lang.Long.parseLong(mh.substring(1, 5), 16) % types.length
      val rep = if (c < 3) t else types(ridx.toInt)
      obs(rep) += 1L
    }
    val g = ManifestIO.ldpOn(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(g("alpha") == ((100L, obs("alpha"))) && g("beta") == ((100L, obs("beta"))),
      s"mechanism diverged from the MessageDigest replay: $g vs $obs")
  }

  // -- gr_linkpred_eval ------------------------------------------------

  test("gr_linkpred_eval: harness matches an independent scorer replay") {
    import spark.implicits._
    // 30 nodes at ~half density (deterministic arithmetic subset): the
    // candidate pool exceeds K, so the three scorers rank DIFFERENT
    // top-K sets and the replay checks real cutoff behavior.
    val nodes = (1L to 30L)
    val allEdges = for {
      a <- nodes; b <- nodes if a < b && (a * 31 + b * 17) % 4 < 2
    } yield (a, b)
    val edges = allEdges.toDF("a", "b")
    // independent split replay
    def held(a: Long, b: Long): Boolean = {
      val mh = md5hex(s"lp:$a:$b")
      java.lang.Long.parseLong(mh.substring(0, 4), 16) % GraphOps.LinkpredHoldoutMod == 0
    }
    val holdout = allEdges.filter { case (a, b) => held(a, b) }.toSet
    val train = allEdges.filterNot { case (a, b) => held(a, b) }
    assert(holdout.nonEmpty, "split replay selected nothing — test graph too small")
    // independent scorer replay; the replay omits the CnDegCap filter,
    // which is safe here because every degree on this 30-node graph is
    // far below CnDegCap=256, so the cap never fires in the operator
    // either (ADVICE r11)
    val adj = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set())
    train.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val trainSet = train.toSet
    val cands = for {
      a <- nodes; b <- nodes if a < b && !trainSet.contains((a, b))
      common = adj(a) intersect adj(b) if common.nonEmpty
    } yield {
      val cn = common.size.toLong * 1000000000L
      val ra = common.toSeq.map(z => 1000000000L / adj(z).size).sum
      val aa = common.toSeq.map(z => 1000000000L / bitlen(adj(z).size.toLong)).sum
      ((a, b), cn, ra, aa)
    }
    def hitsOf(score: ((Long, Long), Long, Long, Long) => Long): Long = {
      val top = cands.toSeq.sortBy(c => (-score(c._1, c._2, c._3, c._4), c._1._1, c._1._2))
        .take(GraphOps.LinkpredK.toInt)
      top.count(c => holdout.contains(c._1)).toLong
    }
    val expect = Map(
      "cn" -> hitsOf((_, cn, _, _) => cn),
      "ra" -> hitsOf((_, _, ra, _) => ra),
      "aa" -> hitsOf((_, _, _, aa) => aa))
    val got = GraphOps.linkpredEvalOn(edges).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == Set("aa", "cn", "ra"), s"scorer rows: $got")
    got.foreach { case (s, (hits, nho)) =>
      assert(nho == holdout.size.toLong, s"$s: n_holdout $nho != ${holdout.size}")
      assert(hits == expect(s), s"$s: hits $hits != replay ${expect(s)}")
    }
  }

  // -- dd_saturation ---------------------------------------------------

  /** texts x y x z y w x w over ids 1..8 (maxid 8, cuts at 2/4/6):
    * docs cum 2,4,6,8; first occurrences x@1 y@2 z@4 w@6 -> unique cum
    * 2,3,4,4; dup 0,1,2,4; rates 0, 2500, 3333, 5000. */
  test("dd_saturation: hand-worked cumulative duplicate curve") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x"), (2L, "y"), (3L, "x"), (4L, "z"),
      (5L, "y"), (6L, "w"), (7L, "x"), (8L, "w")).toDF("doc_id", "text")
    val got = graft.operators.Dedup.saturationOn(docs).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got == Seq(
      (25L, 2L, 2L, 0L, 0L),
      (50L, 4L, 3L, 1L, 2500L),
      (75L, 6L, 4L, 2L, 3333L),
      (100L, 8L, 4L, 4L, 5000L)),
      s"hand-worked saturation curve diverged: $got")
  }

  // -- gr_rich_club ----------------------------------------------------

  /** K4 clique {1..4} + leaves 5,6 on node 1: degrees (5,3,3,3,1,1).
    * k=1 and k=2: club = the 4 clique nodes, all 6 edges -> phi exactly
    * 10000; k=4: only the hub (N=1) -> 0; k=8,16: empty -> 0. */
  test("gr_rich_club: hand-worked hub clique") {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L), (1L, 6L)).toDF("a", "b")
    val got = GraphOps.richClubOn(edges).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == Seq(
      (1L, 4L, 6L, 10000L),
      (2L, 4L, 6L, 10000L),
      (4L, 1L, 0L, 0L),
      (8L, 0L, 0L, 0L),
      (16L, 0L, 0L, 0L)),
      s"hand-worked rich-club table diverged: $got")
  }

  // -- gr_components -----------------------------------------------------

  /** Path 1-2-3, edge 10-11, triangle 20-21-22, edge 30-31: component
    * sizes 3, 2, 3, 2 -> histogram (2 -> 2 components, 3 -> 2). */
  test("gr_components: hand-worked fragment census") {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L), (2L, 3L),
      (10L, 11L),
      (20L, 21L), (20L, 22L), (21L, 22L),
      (30L, 31L)).toDF("a", "b")
    val got = GraphOps.componentsOn(edges).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got == Seq((2L, 2L), (3L, 2L)),
      s"hand-worked component histogram diverged: $got")
  }

  // -- ev_attrib_models --------------------------------------------------

  /** One purchase at es 3630 (window [30, 3630)) over clicks at es 100
    * (hour 0) and 3600/3610/3620 (hour 3600), ranks 1..4. first: 10000
    * to hour 0; last: 10000 to hour 3600; linear: 2500 each; position:
    * 4000/1000/1000/4000. Each model distributes exactly 10000. */
  test("ev_attrib_models: hand-worked four-touch path, all four models") {
    import spark.implicits._
    val ev = Seq(
      (1L, "click", 1L, 100L), (1L, "click", 2L, 3600L),
      (1L, "click", 3L, 3610L), (1L, "click", 4L, 3620L),
      (1L, "purchase", 10L, 3630L))
      .toDF("user_id", "event_type", "event_id", "es")
    val got = graft.operators.Events.attribModelsOn(ev, "click", "purchase", 3600L)
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == Seq(
      ("first", 0L, 1L, 10000L), ("first", 3600L, 3L, 0L),
      ("last", 0L, 1L, 0L), ("last", 3600L, 3L, 10000L),
      ("linear", 0L, 1L, 2500L), ("linear", 3600L, 3L, 7500L),
      ("position", 0L, 1L, 4000L), ("position", 3600L, 3L, 6000L)),
      s"hand-worked attribution comparison diverged: $got")
  }

  // -- mm_audio_tokens ---------------------------------------------------

  /** doc 0: sr 8000, n_chars 0 -> dur 1000ms, n16 16000, frames 98,
    * tokens 13 (kept). doc 1: sr 16000, n_chars 1000 -> dur 138000ms,
    * n16 2208000, frames 13798, tokens 1725 -> truncated to 1500. */
  test("mm_audio_tokens: hand-worked frame/token budget and truncation") {
    import spark.implicits._
    val docs = Seq((0L, "s", 0L), (1L, "s", 1000L))
      .toDF("doc_id", "source", "n_chars")
    val got = graft.operators.Multimodal.audioTokensOn(docs).collect()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) ==
      (("s", 2L, 139000L, 1738L, 1513L, 1L)),
      s"hand-worked audio budget diverged: ${r.toString}")
  }

  // -- ta_bm25 -----------------------------------------------------------

  /** Corpus: 0 "apple banana", 1 "apple apple cherry", 2 "banana",
    * 3 "cherry cherry cherry" (n 4, S 9). For query 0: via apple ->
    * cid 1 (tf 2, df 2, dl 3): idf bitlen(4//2) = 2, tfnorm
    * 7920000 // 630 = 12571 -> 25142; via banana -> cid 2 (tf 1,
    * df 2, dl 1): 3960000 // 306 = 12941 -> 25882. So cid 2 ranks
    * above cid 1; cid 3 shares no term and is absent. */
  test("ta_bm25: hand-worked contributions and ranking for one query") {
    import spark.implicits._
    val docs = Seq(
      (0L, "apple banana"), (1L, "apple apple cherry"),
      (2L, "banana"), (3L, "cherry cherry cherry")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25On(docs).collect().toSeq
      .filter(_.getLong(0) == 0L)
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == Seq((1L, 2L, 25882L), (2L, 1L, 25142L)),
      s"hand-worked BM25 ranking diverged: $got")
  }

  // -- dd_dup_ngrams -----------------------------------------------------

  /** Shingles: doc1 {x,y}, doc2 {x,z}, doc3 {w}. df(x)=2 -> docs 1,2
    * are half-duplicated (decile 5), doc 3 clean (decile 0). */
  test("dd_dup_ngrams: hand-worked duplicated-gram deciles") {
    import spark.implicits._
    val sh = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "z"), (3L, "w"))
      .toDF("doc_id", "sh")
    val got = graft.operators.Dedup.dupNgramsOn(sh).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == Seq((0L, 1L, 1L, 0L), (5L, 2L, 4L, 2L)),
      s"hand-worked dup-gram histogram diverged: $got")
  }

  // -- q33_salted_join -------------------------------------------------

  test("q33_salted_join: salted plan equals the plain unsalted join") {
    val salted = Relational.q33SaltedJoin(spark, sfDir)
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    val su = graft.sources.Tables.supplier(spark, sfDir)
    val plain = li.join(su, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_nationkey")
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(org.apache.spark.sql.types.DataTypes.createDecimalType(18, 6)))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("s_nationkey")
    val a = salted.collect().toSeq
    val b = plain.collect().toSeq
    assert(a == b, s"salting changed semantics: $a vs $b")
  }
}
