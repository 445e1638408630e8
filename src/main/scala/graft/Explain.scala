package graft
import org.apache.spark.sql.SparkSession

/** Plan-capture main (optimization rounds): writes `.explain("formatted")`
  * for each registry query to <outDir>/<name>.txt. Same session config as
  * Bench so the captured plans are the plans the bench runs (AQE initial
  * plans — the SQL-tab final plan needs execution, which explain skips).
  *
  * Building a query's DataFrame executes its eager prefix (localCheckpoints,
  * one-row argmax collects, artifact deploys) — expected; the captured text
  * is the FINAL frame's plan, the fragment the noop sink drives.
  *
  * Usage: SPARK_GRAFT_ONLY=a,b SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Explain /tmp/plans"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outDir = new java.io.File(args.headOption.getOrElse("/tmp/graft_plans"))
    outDir.mkdirs()
    // Shared builder with Bench (ADVICE r13): the captured plans stay the
    // plans the bench runs by construction, not by byte-identical copies.
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val w = new java.io.PrintWriter(new java.io.File(outDir, s"$name.txt"), "UTF-8")
        try w.println(txt) finally w.close()
        println(s"[explain] wrote $name")
      } catch {
        case e: Throwable =>
          System.err.println(s"[explain] $name failed: ${e.toString.linesIterator.next()}")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
