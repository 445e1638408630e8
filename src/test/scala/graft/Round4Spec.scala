package graft

import graft.operators._
import graft.sources.ManifestIO
import org.apache.spark.sql.functions._

/** Round-4 pins: compaction safety (partitioned-root guard, backup-swap
  * cleanup) and the boilerplate df join plan shape. */
class Round4Spec extends SparkSpecBase {

  test("io_compact refuses a Hive-partitioned root instead of flattening it") {
    val path = s"/tmp/graft_io/compact_guard_${System.nanoTime()}"
    spark.read.parquet(s"$sfDir/orders.parquet")
      .write.partitionBy("o_orderpriority").parquet(path)
    val e = intercept[IllegalArgumentException] {
      ManifestIO.compact(spark, path)
    }
    assert(e.getMessage.contains("partition"), e.getMessage)
    // the refused root is untouched — partition dirs still present
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory)
    assert(dirs.length >= 2, dirs.mkString(","))
  }

  test("io_compact leaves no backup/temp dirs after a successful swap") {
    val path = s"/tmp/graft_io/compact_swap_${System.nanoTime()}"
    spark.read.parquet(s"$sfDir/orders.parquet").repartition(9).write.parquet(path)
    ManifestIO.compact(spark, path, targetBytes = 1L * 1024 * 1024)
    assert(!new java.io.File(path + "_compact_tmp").exists())
    assert(!new java.io.File(path + "_compact_old").exists())
    assert(spark.read.parquet(path).count() > 0)
  }

  test("ta_boilerplate df comes from a groupBy join, never a shingle-partitioned window") {
    val p = plan(TextAnalysis.boilerplate(spark, sfDir))
    // a window partitioned by the shingle key would serialize every
    // occurrence of a hot shingle into one task — the plan must not
    // contain a Window at all (both aggregates are hash aggregates)
    assert(!p.contains("Window"), p)
    assert(p.contains("HashAggregate"), p)
  }
}
