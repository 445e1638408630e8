package graft

/** Scale hygiene sweep: every declared query's physical plan is audited for
  * patterns that do not survive a 100x scale-up. The one sanctioned
  * exception is ann_bruteforce, whose broadcast-nested-loop over a BOUNDED
  * broadcast query set is the intended exact baseline. */
class PlanAuditSpec extends SparkSpecBase {

  private val allowNestedLoop = Set("ann_bruteforce")

  test("no query plans a cartesian product") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val p = plan(fn(spark, sfDir))
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
    }
  }

  test("only the sanctioned exact baseline uses a nested-loop join") {
    SparkEntry.queries.foreach { case (name, fn) =>
      if (!allowNestedLoop(name)) {
        val p = plan(fn(spark, sfDir))
        assert(!p.contains("BroadcastNestedLoopJoin"), s"$name:\n$p")
      }
    }
  }

  test("no forced broadcast of O(corpus) tables (per-doc counts/signatures, per-row joins)") {
    // These queries join one-row-per-doc or one-row-per-zone tables that
    // grow with the data; a broadcast() hint there ships the corpus to every
    // executor at 100x. Distribution choice must be left to Catalyst/AQE.
    // (Queries with legitimately bounded broadcasts — a hot-shingle cap set,
    // a #layers manifest, a top-k query side — are not in this list.)
    val mustNotHint = Seq("dd_ngram_jaccard", "dd_minhash", "zs_zonal_stats",
      "zs_tri_zonal", "zs_poly_zonal", "zs_vector_enrich", "zs_polygonize")
    mustNotHint.foreach { name =>
      val analyzed = SparkEntry.queries(name)(spark, sfDir).queryExecution.analyzed.toString
      assert(!analyzed.contains("ResolvedHint"),
        s"$name forces a broadcast of an O(corpus) table:\n$analyzed")
    }
  }

  test("every parquet scan prunes columns (no SELECT * scans of wide tables)") {
    // lineitem is the wide fact table: no lineitem query needs every column
    SparkEntry.queries.foreach { case (name, fn) =>
      val p = plan(fn(spark, sfDir))
      p.linesIterator.filter(_.contains("ReadSchema")).foreach { l =>
        if (l.contains("l_orderkey") || l.contains("l_quantity"))
          assert(!(l.contains("l_comment") && l.contains("l_tax") && l.contains("l_partkey")
            && l.contains("l_shipdate") && l.contains("l_suppkey")),
            s"$name scans too much of lineitem: $l")
      }
    }
  }
}
