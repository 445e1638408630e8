package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Three timed runs per query, report the min: the first run carries JIT
    // / codegen warmup, and this host shows multi-second CPU-steal bursts
    // (identical plans measured 1.6s and 12.9s across runs), so a single
    // sample badly misattributes cost. The noop sink executes the FULL plan
    // (count() lets EliminateSorts drop top-level ORDER BYs, under-billing
    // sorted queries). A failing query is recorded by name and poisons the
    // total — never silently timed as near-zero.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 3).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            errors.getOrElseUpdate(name, e.toString.linesIterator.next().take(200))
            None
        }
      }
      name -> (if (times.isEmpty) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) =>
      // strip control chars too — a tab inside an exception message must
      // not break the single-JSON-line output contract
      val safe = v.replace("\\", "\\\\").replace("\"", "\\\"").filter(_ >= ' ')
      "\"" + k + "\":\"" + safe + "\""
    }.mkString("{", ",", "}")
    // any errored query poisons the headline total to -1: a broken bench
    // must never read as a fast one
    val total = if (errors.nonEmpty) -1.0 else results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
