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
      for (l <- Pipeline.defaultLayers) {
        val enriched = t(s"${l.name} enrich build+persist+count") {
          val e = Pipeline.enrichLayer(spark, dir, l).persist(); e.count(); e }
        val tiles = t(s"${l.name} tiles build+persist+count") {
          val x = Pipeline.tileLayer(spark, dir, l).persist(); x.count(); x }
        t(s"${l.name} write enriched") {
          enriched.write.mode("overwrite").option("partitionOverwriteMode","dynamic")
            .partitionBy("layer").parquet(s"$out/enriched") }
        t(s"${l.name} write tiles") {
          tiles.write.mode("overwrite").option("partitionOverwriteMode","dynamic")
            .partitionBy("layer").parquet(s"$out/tiles") }
        t(s"${l.name} appendMissing") {
          import spark.implicits._
          graft.sources.ManifestIO.appendMissing(spark, Seq(l.name).toDF("layer"), s"$out/_done", "layer") }
        enriched.unpersist(); tiles.unpersist()
      }
      t("second pass (skip)") { Pipeline.runIncremental(spark, dir, out) }
      t("read back + sort") {
        spark.read.parquet(s"$out/enriched")
          .select("layer","zone_id","xmin","ymin","n_points","mean_value")
          .orderBy("layer","zone_id").write.mode("overwrite").format("noop").save() }
    }
    spark.stop()
  }
}
