package graft
import graft.operators.{Geo, Pipeline}
import org.apache.spark.sql.functions._
object PipeProfile {
  def main(args: Array[String]): Unit = {
    // same env contract as Bench so any scale factor / host profiles
    // without a code edit
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[pipeprof] $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // warm up JVM/codegen once
    Pipeline.pipeQuery(spark, dir).write.mode("overwrite").format("noop").save()
    for (round <- 1 to 2) {
      System.err.println(s"[pipeprof] --- round $round ---")
      val out = s"/tmp/graft_pipeprof_$round"
      val p = new org.apache.hadoop.fs.Path(out)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val ls = Pipeline.defaultLayers
      t("write enriched (all layers, one job)") {
        ls.map(Pipeline.enrichLayer(spark, dir, _)).reduce(_ unionByName _)
          .write.mode("overwrite").option("partitionOverwriteMode","dynamic")
          .partitionBy("layer").parquet(s"$out/enriched") }
      t("write tiles (all layers, one job)") {
        ls.map(Pipeline.tileLayer(spark, dir, _)).reduce(_ unionByName _)
          .write.mode("overwrite").option("partitionOverwriteMode","dynamic")
          .partitionBy("layer").parquet(s"$out/tiles") }
      t("metadata counts") {
        spark.read.parquet(s"$out/enriched").groupBy("layer").count().collect()
        spark.read.parquet(s"$out/tiles").groupBy("layer").count().collect() }
      t("appendMissing (one batch)") {
        import spark.implicits._
        graft.sources.ManifestIO.appendMissing(
          spark, ls.map(_.name).toDF("layer"), s"$out/_done", "layer") }
      t("second pass (skip)") { Pipeline.runIncremental(spark, dir, out) }
      t("read back + sort") {
        spark.read.parquet(s"$out/enriched")
          .select("layer","zone_id","xmin","ymin","n_points","mean_value")
          .orderBy("layer","zone_id").write.mode("overwrite").format("noop").save() }
    }
    spark.stop()
  }
}
