package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session; sbt forks a
  * single test JVM). Data: the sf0.001 driver-generated tables. */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpecBase.session
  val sfDir = "/root/testdata/sf0.001"

  /** Formatted physical plan text of a query's DataFrame. */
  def plan(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString("UTF-8")
  }
}

object SparkSpecBase {
  lazy val session: SparkSession = {
    val s = GraftSession.builder("local[4]", 4)
      .config("spark.sql.streaming.checkpointLocation",
        s"/tmp/graft_ckpt_${System.nanoTime()}")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
