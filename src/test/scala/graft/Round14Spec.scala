package graft

import org.apache.spark.sql.functions._

/** Round-9 additions (session 3): suffix-LCP substring dedup semantics,
  * blocking-window entity resolution, the equi-height histogram's exact
  * ntile equivalence, and the export-shard manifest invariants. */
class Round14Spec extends SparkSpecBase {

  test("dd_substring: finds the planted cross-doc substring, clamps exact dups") {
    import spark.implicits._
    // doc 1 and 2 share exactly a 24-char run ("shared quadrant alpha ye");
    // doc 3 overlaps doc 1 by < 16 chars only; docs 4 and 5 are identical
    // 30-char texts (the clamp case: the doubling probe overshoots on
    // equal-when-truncated steps and must clamp to the true length).
    val docs = Seq(
      (1L, "shared quadrant alpha yellow aa"),
      (2L, "shared quadrant alpha yeti bb"),
      (3L, "shared quadra zz"),
      (4L, "identical thirty char texts aa"),
      (5L, "identical thirty char texts aa")).toDF("doc_id", "text")
    val got = graft.operators.Dedup.substringDedupOn(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // the identical pair's longest witness is the whole 30-char text
    assert(got.head == ((30L, "identical thirty char texts aa", 4L, 5L)), s"got ${got.head}")
    // the planted 24-char overlap is witnessed at its exact length
    val planted = got.filter(t => t._3 == 1L && t._4 == 2L).map(_._2)
    assert(planted.contains("shared quadrant alpha ye"), s"got ${planted.toSeq}")
    assert(got.forall(_._1 >= 16L))
    // no witness pairs doc 3 with anyone (max common run < 16 chars)
    assert(!got.exists(t => t._3 == 3L || t._4 == 3L))
  }

  test("dd_substring_cut: merges witness marks into keep-first removal ranges") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared quadrant alpha yellow aa"),
      (2L, "shared quadrant alpha yeti bb"), //   24-char shared prefix
      (4L, "identical thirty char texts aa"),
      (5L, "identical thirty char texts aa")).toDF("doc_id", "text")
    val got = graft.operators.Dedup.substringCutOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // keep-first: only the HIGHER doc of each pair is cut; per-suffix
    // marks [k, 24] / [k, 30] merge into one maximal range each
    assert(got == Seq((2L, 1L, 24L, 24L), (5L, 1L, 30L, 30L)), s"got $got")
  }

  test("dd_entity: pairs only within a block, Levenshtein integer-exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "acme corp north unit extra words"),
      (2L, "acme corp north unyt more stuff"), // dist 1 from doc 1 mention
      (3L, "acme corp south unit extra"), //     same blk, dist 2 from doc 1
      (4L, "zeta corp north unit extra")) //     dist 4 from doc 1 but a
      .toDF("doc_id", "text") //                 different blk: never paired
    val got = graft.operators.Dedup.entityOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 1L), (1L, 3L, 2L), (2L, 3L, 3L)), s"got $got")
  }

  test("dd_entity: the block cap bounds pair generation deterministically") {
    import spark.implicits._
    val docs = (1L to 10L).map(i => (i, s"blk key word$i tail$i filler pad")).toDF("doc_id", "text")
    // cap 3 keeps docs 1..3 (lowest doc_id) -> exactly C(3,2)=3 pairs
    val got = graft.operators.Dedup.entityOn(docs, maxDist = 100L, blockCap = 3)
    assert(got.count() == 3L)
    assert(got.agg(max("doc_b")).collect()(0).getLong(0) == 3L)
  }

  test("io_histogram: exact ntile(8) equivalence without a raw-row global sort") {
    val h = graft.sources.ManifestIO.histogramQuery(spark, sfDir).collect()
    assert(h.length == 8)
    val n = h.map(_.getLong(3)).sum
    // equi-height: bucket sizes are floor/ceil of N/8 in ntile's layout
    val q = n / 8
    val m = n % 8
    h.zipWithIndex.foreach { case (r, i) =>
      val want = if (i < m) q + 1 else q
      assert(r.getLong(3) == want, s"bucket ${i + 1}: ${r.getLong(3)} != $want")
    }
    // ranges tile the value axis in order
    h.zip(h.drop(1)).foreach { case (a, b) =>
      assert(a.getLong(2) <= b.getLong(1), "hi of bucket k must not exceed lo of k+1")
    }
  }

  test("ev_changepoint: locates a planted level shift at its exact hour") {
    import spark.implicits._
    // type "a": 1 event/hour for 50 hours, then 5/hour for 50 hours —
    // the CUSUM statistic peaks exactly at the last pre-shift hour (t=50).
    // Dense spine matters: type "b" has events only in hours 0 and 99 and
    // must still score over all 100 hours.
    val base = 1700000000L
    val a = (0 until 50).map(h => (base + h * 3600L, "a")) ++
      (50 until 100).flatMap(h => Seq.fill(5)((base + h * 3600L, "a")))
    val b = Seq((base, "b"), (base + 99 * 3600L, "b"))
    val got = graft.operators.Events.changepointOn(
        (a ++ b).toDF("hour_epoch", "event_type")).collect()
    val ra = got.find(_.getString(0) == "a").get
    assert(ra.getLong(1) == base + 49 * 3600L, s"cp_hour ${ra.getLong(1)}")
    assert(ra.getLong(3) == 50L && ra.getLong(4) == 250L) // n_before/after
    assert(ra.getLong(5) == 1000L && ra.getLong(6) == 5000L) // rates x1000
    assert(got.map(_.getString(0)).toSet == Set("a", "b"))
  }

  test("ev_anomaly_mad: flags exactly the planted spike (MAD=0 edge)") {
    import spark.implicits._
    // flat 10/hour for 100 hours except hour 40 at 100 events: median 10,
    // MAD 0 (a perfectly flat background), so ANY deviation flags — the
    // robust detector catches the spike a dragged stddev could swallow
    val base = 1700000000L
    val rows = (0 until 100).flatMap { h =>
      val k = if (h == 40) 100 else 10
      Seq.fill(k)((base + h * 3600L, "a"))
    }
    val got = graft.operators.Events.anomalyMadOn(rows.toDF("hour_epoch", "event_type"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((base + 40 * 3600L, 100L, 10L, 0L)), s"got ${got.toSeq}")
  }

  test("ev_lttb: keeps endpoints and the planted spike, hits the target size") {
    import spark.implicits._
    // 600 points of a flat series (vm=100) with one spike (vm=90000) at
    // x=300: the spike's bucket must select the spike, endpoints survive,
    // and the output is ~target+1 points.
    val pts = (0 until 600).map { i =>
      ("s", 1000L + i, if (i == 300) 90000L else 100L, i.toLong)
    }
    val got = graft.operators.Events.lttbOn(pts.toDF("event_type", "xs", "vm", "event_id"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.length == 60, s"got ${got.length} points") // 58 interior + 2 ends
    assert(got.contains((1000L, 100L)) && got.contains((1599L, 100L)), "endpoints kept")
    assert(got.contains((1300L, 90000L)), "spike dropped by downsampling")
  }

  test("dd_containment: detects the asymmetric doc-in-doc pair Jaccard misses") {
    import spark.implicits._
    val long = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val short = "zeta eta theta iota kappa lambda mu nu" // inside `long`
    val docs = Seq((1L, long), (2L, short), (3L, "totally different words here now")).toDF("doc_id", "text")
    val got = graft.operators.Dedup.containmentOn(graft.operators.Dedup.shinglesOn(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5), r.getLong(6)))
    // pair (1,2): every short-doc shingle is in the long doc -> cont=100,
    // while jaccard = 6/18 = 33 — the asymmetric class
    assert(got.head._1 == 1L && got.head._2 == 2L)
    assert(got.head._3 == 100L, s"containment ${got.head._3}")
    assert(got.head._4 <= 50L, s"jaccard ${got.head._4} should stay low")
  }

  test("dd_profile: buckets conserve document mass and shares") {
    val rows = graft.operators.Dedup.dupProfile(spark, sfDir).collect()
    val totalDocs = graft.sources.Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getLong(2)).sum == totalDocs, "document mass conserved")
    val shareSum = rows.map(_.getLong(3)).sum
    assert(shareSum <= 10000L && shareSum > 10000L - 5 * rows.length,
      s"shares sum $shareSum out of truncation band")
    assert(rows.forall(r => r.getLong(1) <= r.getLong(2)), "clusters <= docs per bucket")
  }

  test("gr_ppr: mass stays within the 2-hop ball of the seed set") {
    import spark.implicits._
    val got = graft.operators.GraphOps.ppr(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty && got.length <= 15)
    assert(got.map(_._2).toSeq == got.map(_._2).sortBy(-_).toSeq, "descending")
    assert(got.forall(_._2 > 0L))
    // reachability: every ranked node is a seed or within 2 hops of one
    val ed = graft.operators.GraphOps.coActivityEdges(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (ed ++ ed.map(_.swap)).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val seeds = adj.keySet.toSeq.sorted.take(5).toSet
    val hop1 = seeds ++ seeds.flatMap(s => adj.getOrElse(s, Set.empty))
    val hop2 = hop1 ++ hop1.flatMap(s => adj.getOrElse(s, Set.empty))
    assert(got.map(_._1).forall(hop2), "a ranked node is outside the 2-hop seed ball")
  }

  test("q30_unpivot: long-form totals equal the wide aggregation") {
    val long = graft.operators.Relational.q30Unpivot(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    val wide = graft.sources.Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(graft.sources.Tables.dsum(col("l_quantity")).as("q"),
        graft.sources.Tables.dsum(col("l_tax")).as("t"),
        count(lit(1)).as("n"))
      .collect()
    assert(long.size == wide.length * 4)
    wide.foreach { r =>
      val f = r.getString(0)
      assert(long((f, "l_quantity")) == ((r.getDouble(1), r.getLong(3))))
      assert(long((f, "l_tax")) == ((r.getDouble(2), r.getLong(3))))
    }
  }

  test("ev_streaks: the row_number-difference islands count runs exactly") {
    import spark.implicits._
    val days = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 14L), (1L, 15L), // runs 3 + 2
      (1L, 14L), //                                  duplicate day collapses
      (2L, 5L), (2L, 7L), (2L, 9L), //               three singleton runs
      (3L, 20L)).toDF("user_id", "day")
    val got = graft.operators.Events.streaksOn(days).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, 3L, 2L, 5L), (2L, 1L, 3L, 3L), (3L, 1L, 1L, 1L)), s"got $got")
  }

  test("zs_epoch_delta: top-20 deltas are sane and sorted") {
    val rows = graft.operators.Geo.epochDelta(spark, sfDir).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val absd = rows.map(r => math.abs(r.getLong(4)))
    assert(absd.toSeq == absd.sortBy(-_).toSeq, "sorted by |delta| desc")
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(3) - r.getLong(2), "delta = n2 - n1")
      assert(r.getLong(2) + r.getLong(3) > 0L)
    }
  }

  test("mm_align: recall ordering and query accounting hold") {
    val got = graft.operators.Similarity.mmAlign(spark, sfDir).collect()
    assert(got.map(_.getLong(1)).sum == 40L, "40 text queries accounted")
    got.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3), "hits@1 <= hits@5")
      assert(r.getLong(3) <= r.getLong(1), "hits@5 <= n_queries")
    }
  }

  test("io_partition_evolution: gen-2 prunes by directory, gen-1 filters late") {
    import org.apache.spark.sql.functions.col
    val rows = graft.sources.ManifestIO.partitionEvolutionQuery(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 2L))
    // gen-1 (status-only layout): the priority filter cannot prune, so the
    // scan reads more rows than it matches; gen-2 (evolved spec): the
    // directory pruning makes scanned == matched exactly
    rows.filter(_.getLong(0) == 1L).foreach(r =>
      assert(r.getLong(2) > r.getLong(3), s"gen1 ${r.getString(1)} not amplified"))
    rows.filter(_.getLong(0) == 2L).foreach(r =>
      assert(r.getLong(2) == r.getLong(3), s"gen2 ${r.getString(1)} not pruned"))
    // physical contract: priority appears in gen-2's PartitionFilters and
    // NOT in gen-1's (where it is a late data filter)
    val root = s"/tmp/graft_io/pevo_${Integer.toHexString(sfDir.hashCode)}"
    def pf(path: String): String =
      plan(spark.read.parquet(path).filter(col("o_orderpriority") === "1-URGENT"))
        .linesIterator.filter(_.contains("PartitionFilters")).mkString("\n")
    assert(pf(s"$root/gen2").contains("o_orderpriority"), "gen2 must dir-prune")
    assert(!pf(s"$root/gen1").contains("o_orderpriority"), "gen1 cannot dir-prune")
  }

  test("pipe_export: shard manifest conserves tokens and fills non-tail shards") {
    val shards = graft.operators.Pipeline.pipeExport(spark, sfDir).collect()
    assert(shards.nonEmpty)
    val seqLen = graft.operators.TextAnalysis.SeqLen
    // every shard but the last holds exactly 4 fully packed contexts
    shards.dropRight(1).foreach { r =>
      assert(r.getLong(1) == 4L, s"non-tail shard ${r.getLong(0)} has ${r.getLong(1)} seqs")
      assert(r.getLong(6) == 10000L, s"non-tail shard ${r.getLong(0)} fill ${r.getLong(6)}")
    }
    assert(shards.last.getLong(1) <= 4L)
    // token conservation: shard totals == deduped corpus token count
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val dedupTokens = docs
      .join(graft.operators.Dedup.exactOn(docs).select(col("keep_id").as("doc_id")),
        Seq("doc_id"), "left_semi")
      .select(size(split(col("text"), " ")).cast("long").as("nt"))
      .agg(sum("nt")).collect()(0).getLong(0)
    assert(shards.map(_.getLong(3)).sum == dedupTokens)
  }
}
