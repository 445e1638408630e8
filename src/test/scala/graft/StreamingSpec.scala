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

  test("streaming sessionization (flatMapGroupsWithState) matches batch sessions") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val real = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("value"))
      .as[StreamingJobs.SessEv].collect()
    val maxTs = real.map(_.ts.getTime).max
    // sentinel user -1 events push the watermark far past every real
    // session's close; two sentinel batches so timeouts registered after
    // batch N fire in batch N+1
    def sentinel(offsetMs: Long) =
      StreamingJobs.SessEv(-1L, new Timestamp(maxTs + offsetMs), 0.0)
    val stream = MemoryStream[StreamingJobs.SessEv]
    val q = StreamingJobs.sessionize(stream.toDS(), gapSec = 1800L)
      .toDF().writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    stream.addData(real.toSeq); q.processAllAvailable()
    stream.addData(sentinel(86400000L)); q.processAllAvailable()
    stream.addData(sentinel(86400000L * 2)); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sess").filter(col("user_id") >= 0)
      .select("user_id", "start_sec", "end_sec", "n_events", "sum_value")
    val batch = Events.sessionize(spark, sfDir)
      .select("user_id", "start_sec", "end_sec", "n_events", "sum_value")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      s"stream=${streamed.count()} batch=${batch.count()}")
  }

  test("streaming absence detection matches the batch bucketed join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val real = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type").as("etype"), col("ts"))
      .as[StreamingJobs.AbsEv].collect()
      .sortBy(e => (e.ts.getTime, e.etype, e.event_id))
    val maxTs = real.map(_.ts.getTime).max
    // sentinel user -1 pushes the watermark past every open A's expiry;
    // two batches so timeouts registered after batch N fire in batch N+1
    def sentinel(offsetMs: Long) =
      StreamingJobs.AbsEv(-1L, -1L, "click", new Timestamp(maxTs + offsetMs))
    val stream = MemoryStream[StreamingJobs.AbsEv]
    val q = StreamingJobs.absenceDetect(
        stream.toDS(), "click", "purchase", Events.AbsenceTimeoutSec)
      .toDF().writeStream.format("memory").queryName("absout")
      .outputMode("append").start()
    stream.addData(real.toSeq); q.processAllAvailable()
    stream.addData(sentinel(86400000L)); q.processAllAvailable()
    stream.addData(sentinel(86400000L * 2)); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("absout").filter(col("user_id") >= 0)
      .withColumn("hour_epoch", expr("(ea_sec div 3600) * 3600"))
      .groupBy("hour_epoch")
      .agg(
        count(lit(1)).as("n_a"),
        sum(when(col("followed"), 1L).otherwise(0L)).as("n_followed"),
        sum(when(!col("followed"), 1L).otherwise(0L)).as("n_absent"),
        expr("CASE WHEN sum(CASE WHEN followed THEN 1 ELSE 0 END) = 0 THEN 0L " +
          "ELSE sum(CASE WHEN followed THEN lag_sec ELSE 0L END) " +
          "div sum(CASE WHEN followed THEN 1 ELSE 0 END) END").as("avg_lag_s"))
    val batch = Events.absenceOn(
      Tables.events(spark, sfDir).select(col("user_id"), col("event_type"),
        col("event_id"), unix_timestamp(col("ts")).as("es")),
      "click", "purchase", Events.AbsenceTimeoutSec)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      s"stream=${streamed.count()} batch=${batch.count()}")
  }

  test("file-source streaming (readStream over parquet) matches batch") {
    // the production ingest path: readStream with an explicit schema over a
    // parquet directory, driven to completion against the memory sink
    val batchDf = Tables.events(spark, sfDir)
      .select(col("ts"), col("event_type"), col("value"))
    // FileStreamSource wants a directory: stage the table file into one
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val streamed = Tables.normalizeTs(spark.readStream
        .schema(spark.read.parquet(s"$sfDir/events.parquet").schema)
        .parquet(dir.toString))
      .select(col("ts"), col("event_type"), col("value"))
    val result = StreamingJobs.runToMemory(spark,
      StreamingJobs.windowedAgg(streamed), "file_win_agg",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    val expected = Events.windowedAgg(spark, sfDir)
    assert(result.exceptAll(expected).isEmpty && expected.exceptAll(result).isEmpty,
      s"stream=${result.count()} batch=${expected.count()}")
  }

  test("writeStream to a parquet file sink with checkpointing round-trips") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val stream = MemoryStream[(Timestamp, String, Double)]
    val rows = Tables.events(spark, sfDir)
      .select(col("ts"), col("event_type"), col("value"))
      .as[(Timestamp, String, Double)].collect()
    stream.addData(rows.toSeq)
    // append-mode file sink: project (stateless) — the durable-output path
    val q = stream.toDF().toDF("ts", "event_type", "value")
      .withColumn("hour_epoch", unix_timestamp(date_trunc("hour", col("ts"))))
      .writeStream.format("parquet")
      .option("path", s"$outDir/data")
      .option("checkpointLocation", s"$outDir/ckpt")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val back = spark.read.parquet(s"$outDir/data")
    assert(back.count() == rows.length)
    // exactly-once on restart: re-processing the same offsets adds nothing
    val q2 = stream.toDF().toDF("ts", "event_type", "value")
      .withColumn("hour_epoch", unix_timestamp(date_trunc("hour", col("ts"))))
      .writeStream.format("parquet")
      .option("path", s"$outDir/data")
      .option("checkpointLocation", s"$outDir/ckpt")
      .outputMode("append").start()
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(s"$outDir/data").count() == rows.length)
  }

  test("streaming zonal stats (flagship twin) matches the batch plan per window") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = graft.operators.Geo.points(spark, sfDir)
      .join(Tables.events(spark, sfDir).select("event_id", "ts"), "event_id")
      .select(col("ts"), col("lon"), col("lat"), col("value"))
      .as[(Timestamp, Double, Double, Double)].collect()
    val stream = MemoryStream[(Timestamp, Double, Double, Double)]
    val (a, b) = rows.splitAt(rows.length / 2)
    stream.addData(a.toSeq); stream.addData(b.toSeq)
    val streamed = StreamingJobs.zonalStats(
      stream.toDF().toDF("ts", "lon", "lat", "value"),
      graft.operators.Geo.zones(spark, sfDir))
    val result = StreamingJobs.runToMemory(spark, streamed, "zs_stream", OutputMode.Complete())
    val batch = graft.operators.Geo.pointZoneJoin(spark, sfDir)
      .join(Tables.events(spark, sfDir).select("event_id", "ts"), "event_id")
      .groupBy(window(col("ts"), "1 hour"), col("zone_id"))
      .agg(count(lit(1)).as("n_points"),
        (sum(round(col("value") * lit(100)).cast("long")).cast("double") / lit(100.0)
          / count(lit(1))).as("mean_value"))
      .select(unix_timestamp(col("window.start")).as("hour_epoch"),
        col("zone_id"), col("n_points"), col("mean_value"))
    assert(result.count() > 0)
    assert(result.exceptAll(batch).isEmpty && batch.exceptAll(result).isEmpty,
      s"stream=${result.count()} batch=${batch.count()}")
  }

  test("streaming exact dedup keeps one row per distinct text, state watermark-bounded") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // docs fed in doc_id order so streaming first-arrival == batch min(doc_id)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).orderBy("doc_id")
      .as[(Long, String)].collect()
    val base = new Timestamp(1700000000000L)
    val stream = MemoryStream[(Timestamp, Long, String)]
    val q = StreamingJobs.dedupDocs(stream.toDF().toDF("ts", "doc_id", "text"))
      .writeStream.format("memory").queryName("dedup_docs")
      .outputMode("append").start()
    // micro-batch 1: the corpus; micro-batch 2: every text again under new
    // ids, 1 min later (inside the horizon) — all must be dropped as dups
    stream.addData(docs.map { case (id, t) => (base, id, t) }.toSeq)
    q.processAllAvailable()
    stream.addData(docs.map { case (id, t) =>
      (new Timestamp(base.getTime + 60000L), id + 1000000L, t) }.toSeq)
    q.processAllAvailable()
    q.stop()
    val result = spark.table("dedup_docs")
      .select(col("text_hash"), col("doc_id").as("keep_id"))
    val batch = graft.operators.Dedup.exact(spark, sfDir)
      .select("text_hash", "keep_id")
    assert(result.exceptAll(batch).isEmpty && batch.exceptAll(result).isEmpty,
      s"stream=${result.count()} batch=${batch.count()}")
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

  test("transformWithState sessionization: event-time timers close sessions") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // time-sorted so the second batch is never late against the
      // watermark the first one advanced (split-boundary sessions stitch)
      val real = Tables.events(spark, sfDir)
        .select(col("user_id"), col("ts"), col("value"))
        .as[StreamingJobs.SessEv].collect().sortBy(_.ts.getTime)
      val maxTs = real.map(_.ts.getTime).max
      def sentinel(offsetMs: Long) =
        StreamingJobs.SessEv(-1L, new Timestamp(maxTs + offsetMs), 0.0)
      val stream = MemoryStream[StreamingJobs.SessEv]
      val q = StreamingJobs.sessionizeTws(stream.toDS(), gapSec = 1800L)
        .toDF().writeStream.format("memory").queryName("sess_tws")
        .outputMode("append").start()
      // two real batches (cross-batch session stitching) + two sentinel
      // batches pushing the watermark past every close timer
      val (h1, h2) = real.splitAt(real.length / 2)
      stream.addData(h1.toSeq); q.processAllAvailable()
      stream.addData(h2.toSeq); q.processAllAvailable()
      stream.addData(sentinel(86400000L)); q.processAllAvailable()
      stream.addData(sentinel(86400000L * 2)); q.processAllAvailable()
      q.stop()
      val streamed = spark.table("sess_tws").filter(col("user_id") >= 0)
        .select("user_id", "start_sec", "end_sec", "n_events", "sum_value")
      val batch = Events.sessionize(spark, sfDir)
        .select("user_id", "start_sec", "end_sec", "n_events", "sum_value")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        s"tws=${streamed.count()} batch=${batch.count()}")
    } finally {
      prev match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState MapState: per-type counts converge to batch") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val evs = Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_type"))
        .as[(Long, String)].collect()
      val stream = MemoryStream[(Long, String)]
      val q = StreamingJobs.typeCountsTws(stream.toDS())
        .toDF().writeStream.format("memory").queryName("type_counts_tws")
        .outputMode(OutputMode.Update()).start()
      evs.grouped(evs.length / 3 + 1).foreach { chunk =>
        stream.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      q.stop()
      // counts are monotone per (user, type): the final state row is the max
      val result = spark.table("type_counts_tws")
        .groupBy("user_id", "event_type").agg(max(col("n")).as("n"))
      val expected = Tables.events(spark, sfDir)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      assert(result.exceptAll(expected).isEmpty && expected.exceptAll(result).isEmpty,
        s"tws=${result.count()} batch=${expected.count()}")
    } finally {
      prev match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState ListState: bounded last-N path converges to batch") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // distinct (user, ts, type) so the unique (ts, type) sort order is
      // total and takeRight(n) == the rank window on both paths
      val base = Tables.events(spark, sfDir)
        .select(col("user_id"), unix_timestamp(col("ts")).as("ts_sec"), col("event_type"))
        .distinct().localCheckpoint()
      val evs = base.as[(Long, Long, String)].collect()
      val stream = MemoryStream[(Long, Long, String)]
      // capture emissions WITH their batch id: Update mode re-emits a
      // key's current path each batch, so the converged row per key is
      // the one from its highest batch — a memory-sink table can't
      // recover that (a later batch may emit a lexically smaller path)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String)]
      val q = StreamingJobs.lastNPathTws(stream.toDS(), n = 3)
        .writeStream.outputMode(OutputMode.Update())
        .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingJobs.UserPath], bid: Long) =>
          val rows = df.collect()
          buf.synchronized { rows.foreach(r => buf += ((bid, r.user_id, r.n_in_path, r.path))) }
        }.start()
      // three micro-batches so cross-batch ListState append+trim is exercised
      evs.grouped(evs.length / 3 + 1).foreach { chunk =>
        stream.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      q.stop()
      val result = buf.groupBy(_._2).map { case (u, rs) =>
        val last = rs.maxBy(_._1); (u, last._3, last._4)
      }.toSeq.toDF("user_id", "n_in_path", "path")
      val wRank = Window.partitionBy("user_id")
        .orderBy(col("ts_sec").desc, col("event_type").desc)
      val expected = base
        .withColumn("rn", row_number().over(wRank)).filter(col("rn") <= 3)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_in_path"),
          expr("array_join(transform(array_sort(collect_list(struct(ts_sec, event_type))), " +
            "e -> e.event_type), '>')").as("path"))
        .select("user_id", "n_in_path", "path")
      assert(result.exceptAll(expected).isEmpty && expected.exceptAll(result).isEmpty,
        s"tws=${result.count()} batch=${expected.count()}")
    } finally {
      prev match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState running agg: v2 API parity across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    implicit val sq = spark.sqlContext
    // the v2 API contract: RocksDB-backed state (also the at-scale default)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val evs = Tables.events(spark, sfDir)
        .select(col("user_id"), unix_timestamp(col("ts")).as("ts_sec"), col("value"))
        .as[StreamingJobs.Ev].collect()
      val stream = MemoryStream[StreamingJobs.Ev]
      val out = StreamingJobs.userRunningAggTws(stream.toDS())
      val q = out.toDF().writeStream.format("memory").queryName("user_agg_tws")
        .outputMode(OutputMode.Update()).start()
      // three micro-batches so cross-batch ValueState restore is exercised
      evs.grouped(evs.length / 3 + 1).foreach { chunk =>
        stream.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      q.stop()
      // Update mode emits one row per key per touching batch; the final
      // state row per key is the one with the largest running count
      val result = spark.table("user_agg_tws")
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy(col("n_events").desc)))
        .filter(col("rn") === 1).drop("rn")
      val expected = Tables.events(spark, sfDir)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          Tables.dsum(col("value")).as("sum_value"),
          max(unix_timestamp(col("ts"))).as("max_ts_sec"))
      assert(result.exceptAll(expected).isEmpty && expected.exceptAll(result).isEmpty,
        s"tws=${result.count()} batch=${expected.count()}")
    } finally {
      prev match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState ProcessingTime timers: idle flush conserves every amount") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[(Long, Long)]
      // A registered processing-time timer makes the engine schedule
      // batch after batch on its own (shouldRunAnotherBatch stays true so
      // pending timers can fire) — which also means processAllAvailable
      // NEVER RETURNS under this mode. So this test drives the query the
      // only deterministic way: a paced trigger, addData without any
      // blocking call, and a bounded poll on the sink until the expected
      // flush lands. Nothing asserts WHICH batch a timer fires in — the
      // pins are clock-free: exact conservation (every amount in exactly
      // one flush) and liveness (an idle key's timer does fire).
      val buf = scala.collection.mutable.ArrayBuffer.empty[StreamingJobs.FlushOut]
      val q = StreamingJobs.idleFlushTws(stream.toDS(), idleMs = 20L)
        .writeStream.outputMode(OutputMode.Update())
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
        .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingJobs.FlushOut], _: Long) =>
          val rows = df.collect()
          buf.synchronized { rows.foreach(buf += _) }
        }.start()
      def rowsOf(u: Long): Vector[StreamingJobs.FlushOut] =
        buf.synchronized { buf.filter(_.user_id == u).toVector }
      def await(what: String)(done: => Boolean): Unit = {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (!done && System.nanoTime() < deadline) Thread.sleep(25L)
        assert(done, s"timed out awaiting $what; buf=${buf.synchronized(buf.toVector)}")
      }
      // one addData call = one atomic MemoryStream block = one batch, so
      // key 1's two amounts always accumulate before any flush
      stream.addData(Seq((1L, 10L), (1L, 20L), (2L, 5L)))
      await("first idle flush of keys 1 and 2")(
        rowsOf(1L).nonEmpty && rowsOf(2L).nonEmpty)
      assert(rowsOf(1L) == Vector(StreamingJobs.FlushOut(1L, 2L, 30L, "timer")),
        s"key 1 first flush: ${rowsOf(1L)}")
      assert(rowsOf(2L) == Vector(StreamingJobs.FlushOut(2L, 1L, 5L, "timer")),
        s"key 2 first flush: ${rowsOf(2L)}")
      // state cleared by the flush: new input re-accumulates from zero
      stream.addData(Seq((1L, 7L)))
      await("key 1 second idle flush")(rowsOf(1L).size >= 2)
      assert(rowsOf(1L)(1) == StreamingJobs.FlushOut(1L, 1L, 7L, "timer"),
        s"key 1 second flush: ${rowsOf(1L)}")
      // drain poison in the same block as fresh input: flushes inline,
      // deletes the armed timer, and the timer must never re-fire it
      stream.addData(Seq((1L, 3L), (1L, -1L)))
      await("key 1 drain flush")(rowsOf(1L).size >= 3)
      assert(rowsOf(1L)(2) == StreamingJobs.FlushOut(1L, 1L, 3L, "drain"),
        s"key 1 drain flush: ${rowsOf(1L)}")
      // a poison on an already-flushed (empty) key emits nothing — give
      // the engine a couple of trigger periods, then pin totals
      stream.addData(Seq((2L, -1L)))
      Thread.sleep(300L)
      q.stop()
      val all = buf.synchronized { buf.toVector }
      // conservation: every amount in exactly one flush, no empty rows
      assert(rowsOf(1L).map(r => (r.n, r.total)) == Vector((2L, 30L), (1L, 7L), (1L, 3L)),
        s"key 1 lost or double-flushed: ${rowsOf(1L)}")
      assert(rowsOf(2L).map(r => (r.n, r.total)) == Vector((1L, 5L)),
        s"key 2 lost, double-flushed, or empty-drained: ${rowsOf(2L)}")
      assert(all.forall(r => r.n > 0L && (r.via == "timer" || r.via == "drain")),
        s"malformed flush rows: ${all.filterNot(r => r.n > 0L)}")
    } finally {
      prev match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("stream-stream interval join matches the batch range join pair set") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, Timestamp, Double)].collect()
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[(Long, Long, Timestamp)].collect()

    val cs = MemoryStream[(Long, Timestamp, Double)]
    val ps = MemoryStream[(Long, Long, Timestamp)]
    // split into two micro-batches each so join state carries across
    val (c1, c2) = clicks.splitAt(clicks.length / 2)
    val (p1, p2) = purchases.splitAt(purchases.length / 2)
    cs.addData(c1.toSeq); ps.addData(p1.toSeq)
    cs.addData(c2.toSeq); ps.addData(p2.toSeq)

    val streamed = StreamingJobs.intervalJoin(
      cs.toDF().toDF("user_id", "ts", "value"),
      ps.toDF().toDF("user_id", "event_id", "ts"))
    val result = StreamingJobs.runToMemory(spark, streamed, "ivl_join", OutputMode.Append())

    // batch reference: the same pair set, unaggregated
    val expected = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts").as("p_ts"))
      .join(ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("value").as("c_value")),
        col("user_id") === col("c_user")
          && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
          && col("c_ts") < col("p_ts"))
      .select(col("event_id"), col("user_id"), col("p_ts"), col("c_ts"), col("c_value"))
    assert(result.count() > 0, "no joined pairs — spec data broken")
    assert(result.exceptAll(expected).isEmpty && expected.exceptAll(result).isEmpty,
      s"stream=${result.count()} batch=${expected.count()}")
  }

  test("left-outer interval join emits the unmatched purchase after watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // user 1: click 30 min before its purchase -> matched pair.
    // user 2: purchase with NO click in the preceding hour -> must emit a
    // null-click row, but ONLY once sentinel clicks push the click-side
    // watermark past the join bound.
    val base = 3600L * 600000 * 1000L // ms
    val cs = MemoryStream[(Long, Timestamp, Double)]
    val ps = MemoryStream[(Long, Long, Timestamp)]
    val streamed = StreamingJobs.intervalJoinOuter(
      cs.toDF().toDF("user_id", "ts", "value"),
      ps.toDF().toDF("user_id", "event_id", "ts"))
    val q = streamed.writeStream.format("memory").queryName("ivl_outer")
      .outputMode("append").start()
    cs.addData((1L, new Timestamp(base - 1800000L), 7.5))
    ps.addData((1L, 101L, new Timestamp(base)), (2L, 102L, new Timestamp(base)))
    q.processAllAvailable()
    val beforeWm = spark.table("ivl_outer").filter(col("event_id") === 102L).count()
    assert(beforeWm == 0L, "null row must be withheld until the watermark proves absence")
    // the join watermark is the MIN over both inputs — sentinels must
    // advance the purchase side too or the null row stays provably-open
    def sentC(offsetMs: Long) = (-1L, new Timestamp(base + offsetMs), 0.0)
    def sentP(offsetMs: Long) = (-1L, -1L, new Timestamp(base + offsetMs))
    cs.addData(sentC(86400000L)); ps.addData(sentP(86400000L)); q.processAllAvailable()
    cs.addData(sentC(86400000L * 2)); ps.addData(sentP(86400000L * 2)); q.processAllAvailable()
    q.stop()
    val out = spark.table("ivl_outer").filter(col("user_id") >= 0)
      .select("event_id", "user_id", "c_value").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(out == Set((101L, 1L, Some(7.5)), (102L, 2L, None)))
  }

  test("stream-static dimension enrich matches the batch join") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // the common ingest-enrichment shape not covered by the zonal-stats
    // twin: a keyed equi-join from the stream to a STATIC dimension
    // (broadcast per micro-batch; the dimension is re-read each batch, so
    // a catalog refresh is picked up without restarting the query)
    val dim = Tables.nation(spark, sfDir).select(col("n_nationkey").as("nk"), col("n_name"))
    def enrich(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("nk", col("user_id") % 25)
      .join(broadcast(dim), Seq("nk"))
      .groupBy(window(col("ts"), "1 hour"), col("n_name"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("hour_epoch"),
        col("n_name"), col("n"), col("sum_value"))
    val rows = Tables.events(spark, sfDir)
      .select(col("ts"), col("user_id"), col("value"))
      .as[(Timestamp, Long, Double)].collect()
    val stream = MemoryStream[(Timestamp, Long, Double)]
    val (a, b) = rows.splitAt(rows.length / 2)
    stream.addData(a.toSeq); stream.addData(b.toSeq)
    val streamed = enrich(stream.toDF().toDF("ts", "user_id", "value")
      .withWatermark("ts", "2 hours"))
    val result = StreamingJobs.runToMemory(spark, streamed, "ss_enrich", OutputMode.Complete())
    val batch = enrich(Tables.events(spark, sfDir).select(col("ts"), col("user_id"), col("value")))
    assert(result.count() > 0)
    assert(result.exceptAll(batch).isEmpty && batch.exceptAll(result).isEmpty,
      s"stream=${result.count()} batch=${batch.count()}")
  }

  test("streaming ANN probe router matches the batch window-ranked probe set") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val P = graft.operators.Similarity.MultiProbeP
    val cb = graft.operators.Similarity.trainedCodebook(spark, sfDir).localCheckpoint()
    // stream five query embeddings through the stateless router
    val qRows = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val stream = MemoryStream[(Long, Seq[Float])]
    stream.addData(qRows.toSeq)
    val routed = StreamingJobs.annProbeRoute(
      stream.toDF().toDF("qid", "embedding"), cb, P)
    val result = StreamingJobs.runToMemory(spark, routed, "ann_route", OutputMode.Append())
    // expected: the batch multiprobe's centroid-ranking stage (window
    // form — a DIFFERENT plan shape over the same exact-integer distance)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("vec_id").orderBy(
      (col("p").cast("double") / (col("n") * col("n")).cast("double")).asc, col("c").asc)
    val expected = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 5)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
      .withColumn("xq", expr("CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)"))
      .join(broadcast(cb), Seq("i"))
      .withColumn("t", expr("xq * n - cS"))
      .groupBy("vec_id", "c")
      .agg(sum(expr("t * t")).as("p"), max(col("n")).as("n"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= P)
      .select(col("vec_id").as("qid"), col("rn").cast("long").as("probe_rank"), col("c"))
    assert(result.count() == 5L * P, s"expected ${5 * P} probe rows, got ${result.count()}")
    assert(result.exceptAll(expected).isEmpty && expected.exceptAll(result).isEmpty,
      s"stream=${result.count()} batch=${expected.count()}")
  }

  test("streaming NB deploy: persisted artifact, batch parity, replay determinism") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "n_chars")
    // batch train -> persist the artifact -> read it back (the deploy split)
    val modelPath = s"/tmp/graft_nb_model_${System.nanoTime()}"
    graft.operators.TextAnalysis.nbTrainOn(docs).write.parquet(modelPath)
    val model = spark.read.parquet(modelPath)
    val rows = docs.select(col("doc_id"), col("text")).as[(Long, String)].collect()

    def runOnce(name: String): org.apache.spark.sql.DataFrame = {
      val stream = MemoryStream[(Long, String)]
      val (a, b) = rows.splitAt(rows.length / 2)
      stream.addData(a.toSeq)
      stream.addData(b.toSeq) // two micro-batches: scores must not depend on batching
      val scored = StreamingJobs.nbScoreStream(
        stream.toDF().toDF("doc_id", "text"), model)
      StreamingJobs.runToMemory(spark, scored, name, OutputMode.Append())
    }
    val streamed = runOnce("nb_deploy")
    val batch = StreamingJobs.nbScoreBatch(docs, model)
    assert(streamed.count() > 0, "no documents scored")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      s"stream=${streamed.count()} batch=${batch.count()}")
    // replay: a fresh stream over the same rows reproduces identical scores
    val replayed = runOnce("nb_deploy_replay")
    assert(replayed.exceptAll(streamed).isEmpty && streamed.exceptAll(replayed).isEmpty,
      "replay must be deterministic")
  }

  test("streaming bottom-K reservoir: order-invariant, equals the batch sample") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val k = graft.operators.Events.ReservoirK
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"))
      .withColumn("hv", expr(
        "CAST(conv(substring(md5(concat('rv:', CAST(event_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"))
      .as[StreamingJobs.RsvEv].collect()

    def finalRows(order: Seq[StreamingJobs.RsvEv], name: String) = {
      val stream = MemoryStream[StreamingJobs.RsvEv]
      val (a, b) = order.splitAt(order.length / 2)
      stream.addData(a)
      stream.addData(b)
      val out = StreamingJobs.reservoirStream(stream.toDS(), k)
      val all = StreamingJobs.runToMemory(spark, out.toDF(), name, OutputMode.Update())
      // newest update per user (n_seen is the per-key update stamp)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("n_seen").desc)
      all.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_ids"))
    }
    val fwd = finalRows(evs.toSeq, "rsv_fwd")
    val rev = finalRows(evs.reverse.toSeq, "rsv_rev")
    assert(fwd.exceptAll(rev).isEmpty && rev.exceptAll(fwd).isEmpty,
      "arrival order changed the reservoir")
    val batch = graft.operators.Events.reservoir(spark, sfDir)
      .groupBy("user_id")
      .agg(sort_array(collect_list(col("event_id"))).as("event_ids"))
    assert(fwd.exceptAll(batch).isEmpty && batch.exceptAll(fwd).isEmpty,
      s"stream=${fwd.count()} batch=${batch.count()}")
  }

  test("native session_window sessionization matches the batch gap rule") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("value"))
      .as[StreamingJobs.SessEv].collect()
    val maxTs = rows.map(_.ts.getTime).max
    val stream = MemoryStream[StreamingJobs.SessEv]
    val q = StreamingJobs.sessionWindowAgg(stream.toDF())
      .writeStream.format("memory").queryName("native_sess")
      .outputMode("append").start()
    // all real events in one micro-batch (a split batch could strand
    // before-watermark rows), then a far-future sentinel (user -1) so the
    // watermark passes every real session's close and append emits them
    stream.addData(rows.toSeq); q.processAllAvailable()
    stream.addData(StreamingJobs.SessEv(-1L, new Timestamp(maxTs + 86400000L), 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("native_sess").filter(col("user_id") >= 0)
      .select("user_id", "start_sec", "end_sec", "n_events", "sum_value")
    val batch = Events.sessionize(spark, sfDir)
      .select("user_id", "start_sec", "end_sec", "n_events", "sum_value")
    assert(streamed.count() > 0, "no sessions emitted")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      s"stream=${streamed.count()} batch=${batch.count()}")
  }
}
