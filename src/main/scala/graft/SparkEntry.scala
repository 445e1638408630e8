package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{AsofJoin, Dedup, Events, Geo, GraphOps, Multimodal, Pipeline, Relational, Similarity, TextAnalysis}
import graft.sources.ManifestIO

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of every operator module's map; `oracleSql` the
  * union of their DuckDB oracles. Keys match SURVEY.md §2 line by line.
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracle),
      (AsofJoin.queries, AsofJoin.oracle),
      (Geo.queries, Geo.oracle),
      (Events.queries, Events.oracle),
      (Dedup.queries, Dedup.oracle),
      (Similarity.queries, Similarity.oracle),
      (TextAnalysis.queries, TextAnalysis.oracle),
      (Multimodal.queries, Multimodal.oracle),
      (ManifestIO.queries, ManifestIO.oracle),
      (GraphOps.queries, GraphOps.oracle),
      (Pipeline.queries, Pipeline.oracle))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Zonal statistics is the reference's core computation (stats.py). */
  def entry(spark: SparkSession): DataFrame =
    Geo.zonalStats(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
