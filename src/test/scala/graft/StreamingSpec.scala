package graft

import graft.operators.Events
import graft.streaming.StreamingJobs
import graft.sources.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamingSpec extends SparkSpecBase {

  test("streaming tumbling-window agg matches the batch plan row for row") {
    import spark.implicits._
    val batch = Tables.events(spark, sfDir)
      .select(col("ts"), col("event_type"), col("value"))
    val rows = batch.as[(Timestamp, String, Double)].collect()

    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double)]
    // two micro-batches to exercise incremental state
    val (a, b) = rows.splitAt(rows.length / 2)
    stream.addData(a.toSeq)
    stream.addData(b.toSeq)

    val streamed = StreamingJobs.windowedAgg(
      stream.toDF().toDF("ts", "event_type", "value"))
    val result = StreamingJobs.runToMemory(spark, streamed, "win_agg", OutputMode.Complete())

    val expected = Events.windowedAgg(spark, sfDir)
    assert(result.exceptAll(expected).isEmpty && expected.exceptAll(result).isEmpty,
      s"stream=${result.count()} batch=${expected.count()}")
  }

  test("stateful per-user running agg matches batch groupBy") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("ts_sec"), col("value"))
      .as[StreamingJobs.Ev].collect()
    val stream = MemoryStream[StreamingJobs.Ev]
    stream.addData(evs.toSeq)
    val out = StreamingJobs.userRunningAgg(stream.toDS())
    val result = StreamingJobs.runToMemory(spark, out.toDF(), "user_agg", OutputMode.Update())

    val expected = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        Tables.dsum(col("value")).as("sum_value"),
        max(unix_timestamp(col("ts"))).as("max_ts_sec"))
    assert(result.exceptAll(expected).isEmpty && expected.exceptAll(result).isEmpty,
      s"stream=${result.count()} batch=${expected.count()}")
  }
}
