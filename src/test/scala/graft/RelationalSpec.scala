package graft

import graft.operators.Relational

/** Plan-shape and sanity specs for the relational suite. Value correctness
  * is owned by the DuckDB oracle gate (Verify + tools/check.py); these
  * specs pin the physical plans we designed for (SURVEY.md §5). */
class RelationalSpec extends SparkSpecBase {

  test("q4 pushes both predicates and prunes columns at the parquet scan") {
    val p = plan(Relational.q4FilterPushdown(spark, sfDir))
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("l_shipdate"), p)
    assert(p.contains("l_quantity"), p)
    // projection pruning: unused wide columns never reach the scan schema
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_partkey"), readSchema)
  }

  test("q2 dimension joins are broadcast (no shuffle joins)") {
    val p = plan(Relational.q2JoinBroadcast(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q8 global top-k plans as TakeOrderedAndProject, not a full sort") {
    val p = plan(Relational.q8SortTopk(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q1 aggregates with map-side partial aggregation") {
    val p = plan(Relational.q1Agg(spark, sfDir))
    assert(p.contains("HashAggregate"), p)
    assert(p.split("HashAggregate").length > 2, "expected partial+final agg\n" + p)
  }

  test("q6 anti/semi joins return disjoint complete partition of orders") {
    val df = Relational.q6AntiSemi(spark, sfDir)
    val total = df.selectExpr("sum(n_clean + n_returned)").collect()(0).getLong(0)
    val orders = spark.read.parquet(s"$sfDir/orders.parquet").count()
    assert(total == orders)
  }

  test("q13 sketch estimates sit inside their error bounds") {
    val exact = Relational.q7Distinct(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    Relational.q13Sketch(spark, sfDir).collect().foreach { r =>
      val (flag, aParts, aSupps) = (r.getString(0), r.getLong(1), r.getLong(2))
      val (eParts, eSupps) = exact(flag)
      // rsd 0.02 => generous 10% guard band
      assert(math.abs(aParts - eParts) <= eParts * 0.1, s"$flag parts $aParts vs $eParts")
      assert(math.abs(aSupps - eSupps) <= eSupps * 0.1, s"$flag supps $aSupps vs $eSupps")
    }
  }

  test("io_partitioned_scan prunes to one partition directory") {
    val p = plan(graft.sources.ManifestIO.partitionedScanQuery(spark, sfDir))
    assert(p.contains("PartitionFilters"), p)
    assert(p.contains("1-URGENT"), p)
  }

  test("q5 plans a single Window node (shared sort)") {
    val p = plan(Relational.q5Window(spark, sfDir))
    val windowNodes = "\\(\\d+\\) Window\\b".r.findAllIn(p).size
    assert(windowNodes == 1, p)
  }
}
