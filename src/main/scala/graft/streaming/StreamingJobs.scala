package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event operators (SURVEY.md §2.G).
  *
  * The reference pipeline is batch-only; at 100 TB the ingest side of the
  * same computation is a stream. These jobs take any streaming DataFrame
  * with the `events` schema (ts TIMESTAMP, event_type STRING, user_id LONG,
  * value DOUBLE) — readStream from files/Kafka in production, MemoryStream
  * in the specs — and declare the exact same logical aggregation as the
  * batch operators so results are comparable row for row.
  */
object StreamingJobs {

  /** Tumbling 1-hour window per event type, 2-hour watermark: the streaming
    * twin of Events.windowedAgg (same output schema). State is bounded by
    * the watermark horizon; partial aggregation happens map-side per
    * micro-batch. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("hour_epoch"),
        col("event_type"), col("n_events"), col("sum_value"))

  final case class Ev(user_id: Long, ts_sec: Long, value: Double)
  final case class UserAgg(user_id: Long, n_events: Long, sum_value: Double, max_ts_sec: Long)

  /** Keyed running aggregate via mapGroupsWithState (ProcessingTimeTimeout
    * never fires in the specs): per-user event count / value sum — the
    * stateful-shuffle shape sessionization and per-key feature extraction
    * use at scale. State per key is O(1). */
  def userRunningAgg(events: Dataset[Ev]): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserAgg, UserAgg](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Ev], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(user, 0L, 0.0, Long.MinValue))
          val next = rows.foldLeft(prev) { (a, e) =>
            UserAgg(user, a.n_events + 1,
              // decimal-exact accumulation to match batch dsum
              (BigDecimal(a.sum_value) + BigDecimal(e.value)).toDouble,
              math.max(a.max_ts_sec, e.ts_sec))
          }
          state.update(next)
          next
      }
  }

  /** Convenience: run a streaming DataFrame to completion against an
    * in-memory sink and return the result table. Test/dev harness only. */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
