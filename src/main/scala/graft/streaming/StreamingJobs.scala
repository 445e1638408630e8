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

  /** Gap-based sessionization on the NATIVE session_window function — the
    * declarative twin of the flatMapGroupsWithState job below (same 1800s
    * gap rule: an event exactly gap seconds after the last one starts a
    * new session, because session windows span [first, last + gap) with an
    * exclusive end). Spark merges/expires session state under the
    * watermark; no hand-rolled state machine. Output schema matches
    * Events.sessionize minus the per-user session index (window identity
    * replaces it). */
  def sessionWindowAgg(events: DataFrame, gapSec: Long = 1800L): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapSec seconds"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_timestamp(col("ts"))).as("start_sec"),
        max(unix_timestamp(col("ts"))).as("end_sec"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"))
      .select(col("user_id"), col("n_events"), col("start_sec"), col("end_sec"),
        col("sum_value"))

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

  /** The SAME running aggregate on Spark 4's transformWithState — the
    * arbitrary-stateful-processing v2 API that replaces mapGroupsWithState
    * for new jobs (typed ValueState/ListState/MapState handles, timers,
    * state TTL, and RocksDB-backed state with changelog checkpointing).
    * Semantics are pinned identical to userRunningAgg: one ValueState per
    * user holding the decimal-exact running (count, sum, max-ts), one
    * output row per key per micro-batch. StreamingSpec runs the three-way
    * parity (batch agg == mapGroupsWithState == transformWithState) with
    * the input split across micro-batches so cross-batch state restore is
    * exercised. Requires the RocksDB state store provider (the v2 API
    * contract; set in the spec, and the production default at scale —
    * state no longer bounded by executor heap). */
  class RunningAggProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, UserAgg] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[UserAgg] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[UserAgg]("agg",
        org.apache.spark.sql.Encoders.product[UserAgg],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Ev],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[UserAgg] = {
      val prev = if (st.exists()) st.get() else UserAgg(key, 0L, 0.0, Long.MinValue)
      val next = rows.foldLeft(prev) { (a, e) =>
        UserAgg(key, a.n_events + 1,
          (BigDecimal(a.sum_value) + BigDecimal(e.value)).toDouble,
          math.max(a.max_ts_sec, e.ts_sec))
      }
      st.update(next)
      Iterator.single(next)
    }
  }

  def userRunningAggTws(events: Dataset[Ev]): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningAggProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** Gap sessionization on transformWithState with EVENT-TIME TIMERS —
    * the v2 API's timer surface (registerTimer / handleExpiredTimer),
    * exercised the way a production sessionizer needs it: each batch
    * folds the user's events into the open-session ValueState, deletes
    * any stale timer, and re-arms one at (last event + gap); the timer
    * fires when the WATERMARK passes it and handleExpiredTimer closes
    * the session — the exact fMGWS setTimeoutTimestamp semantics on the
    * new API, with the same decimal accumulator, so StreamingSpec pins
    * session-for-session parity with batch ev_sessionize AND the fMGWS
    * job. Mid-batch gap splits close inline; only the open tail rides a
    * timer. */
  class SessionizeProcessor(gapSec: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, SessEv, SessionOut] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[SessState] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[SessState]("open",
        org.apache.spark.sql.Encoders.product[SessState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    private def close(uid: Long, s: SessState): SessionOut =
      SessionOut(uid, s.start_sec, s.last_sec, s.n, s.sum.doubleValue())
    override def handleInputRows(uid: Long, rows: Iterator[SessEv],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[SessionOut] = {
      val sorted = rows.toIndexedSeq.sortBy(_.ts.getTime)
      var open = if (st.exists()) Some(st.get()) else None
      val out = Vector.newBuilder[SessionOut]
      sorted.foreach { e =>
        val sec = e.ts.getTime / 1000L
        val v = java.math.BigDecimal.valueOf(e.value).setScale(4)
        open match {
          case Some(s) if sec - s.last_sec < gapSec =>
            open = Some(SessState(s.start_sec, sec, s.n + 1, s.sum.add(v)))
          case Some(s) =>
            out += close(uid, s)
            open = Some(SessState(sec, sec, 1L, v))
          case None =>
            open = Some(SessState(sec, sec, 1L, v))
        }
      }
      open.foreach { s =>
        st.update(s)
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
        getHandle.registerTimer(math.max(
          (s.last_sec + gapSec) * 1000L, tv.getCurrentWatermarkInMs() + 1))
      }
      out.result().iterator
    }
    override def handleExpiredTimer(uid: Long,
        tv: org.apache.spark.sql.streaming.TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessionOut] = {
      if (!st.exists()) Iterator.empty
      else {
        val s = st.get()
        if (tv.getCurrentWatermarkInMs() >= (s.last_sec + gapSec) * 1000L) {
          st.clear()
          Iterator.single(close(uid, s))
        } else {
          // a stale firing (session was extended): re-arm for the tail
          getHandle.registerTimer((s.last_sec + gapSec) * 1000L)
          Iterator.empty
        }
      }
    }
  }

  final case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** Per-(user, type) running counts on transformWithState MapState —
    * the v2 API's keyed-sub-state surface (ValueState and timers are
    * covered by the two jobs above; MapState completes the sweep): one
    * map entry per event type under each user key, updated per batch,
    * the full map re-emitted so Update-mode output converges to the
    * batch groupBy. At scale this is the per-key feature-map shape
    * (bounded sub-keys per user) that would otherwise need a composite
    * grouping key and a second shuffle. */
  class TypeCountProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, String), TypeCount] {
    @transient private var st: org.apache.spark.sql.streaming.MapState[String, Long] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getMapState[String, Long]("bytype",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[TypeCount] = {
      rows.foreach { case (_, t) =>
        val cur = if (st.containsKey(t)) st.getValue(t) else 0L
        st.updateValue(t, cur + 1L)
      }
      st.iterator().map { case (t, n) => TypeCount(key, t, n) }.toVector.iterator
    }
  }

  def typeCountsTws(events: Dataset[(Long, String)]): Dataset[TypeCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .transformWithState(new TypeCountProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  final case class PathEv(ts_sec: Long, event_type: String)
  final case class UserPath(user_id: Long, n_in_path: Long, path: String)

  /** Bounded LAST-N EVENT PATH per user on transformWithState ListState —
    * the v2 API's remaining state type (ValueState, timers, and MapState
    * are covered by the three jobs above; ListState completes the sweep):
    * each batch appends the user's new events to the list, re-sorts on
    * the unique (ts, type) order, and PUTS BACK only the most recent n —
    * the state is bounded at n entries per key by construction, the
    * clickstream-context shape (ev_paths' last-events window) a serving
    * feature store keeps per user. Update-mode re-emits the key's current
    * path each batch; the final row per key converges to the batch
    * last-n window regardless of how events split across batches
    * (StreamingSpec pins parity on a 3-batch split). */
  class LastNPathProcessor(n: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, Long, String), UserPath] {
    @transient private var st: org.apache.spark.sql.streaming.ListState[PathEv] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getListState[PathEv]("path",
        org.apache.spark.sql.Encoders.product[PathEv],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Long, String)],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[UserPath] = {
      rows.foreach { case (_, ts, t) => st.appendValue(PathEv(ts, t)) }
      val kept = st.get().toVector
        .sortBy(e => (e.ts_sec, e.event_type)) // unique tie order (§4 rule)
        .takeRight(n)
      st.put(kept.toArray) // bounded: never more than n entries per key
      Iterator.single(UserPath(key, kept.size.toLong,
        kept.map(_.event_type).mkString(">")))
    }
  }

  def lastNPathTws(events: Dataset[(Long, Long, String)], n: Int): Dataset[UserPath] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .transformWithState(new LastNPathProcessor(n),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  final case class FlushAcc(n: Long, total: Long)
  final case class FlushOut(user_id: Long, n: Long, total: Long, via: String)

  /** Idle-flush accumulator on transformWithState PROCESSING-TIME TIMERS —
    * the last arbitrary-state-v2 mode (ValueState/MapState/ListState and
    * event-time timers are covered by the jobs above): per key, integer
    * amounts accumulate in ValueState and each input batch re-arms ONE
    * processing-time timer at now + idleMs (delete-then-register, the
    * sessionizer's re-arm discipline); when the timer expires the key's
    * accumulator flushes (via = 'timer') and clears. A negative amount is
    * the drain poison pill: the key flushes inline (via = 'drain'),
    * clears state AND its timer — the shutdown path a production
    * idle-flush job needs.
    *
    * Determinism contract (why this is testable at all): processing time
    * is wall-clock, so the spec never asserts WHICH batch a timer fires
    * in. The pinned invariants are clock-free — CONSERVATION (every
    * amount appears in exactly one flush: no loss when a timer and new
    * input race, no double flush after a drain) and LIVENESS (an idle
    * key's timer does fire, awaited by a bounded sink poll — never a
    * single racy sleep). Engine behavior this mode forces (measured):
    * once any processing-time timer is registered the micro-batch engine
    * schedules batch after batch so pending timers can fire, which means
    * processAllAvailable NEVER RETURNS — a test must drive the query
    * with a paced trigger and poll the sink instead (StreamingSpec).
    * State per key is O(1); timers are per-key singletons. */
  class IdleFlushProcessor(idleMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, Long), FlushOut] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[FlushAcc] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[FlushAcc]("acc",
        org.apache.spark.sql.Encoders.product[FlushAcc],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[FlushOut] = {
      var drain = false
      var acc = if (st.exists()) st.get() else FlushAcc(0L, 0L)
      rows.foreach { case (_, amount) =>
        if (amount < 0L) drain = true
        else acc = FlushAcc(acc.n + 1L, acc.total + amount)
      }
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      if (drain) {
        st.clear()
        if (acc.n > 0L) Iterator.single(FlushOut(key, acc.n, acc.total, "drain"))
        else Iterator.empty
      } else {
        st.update(acc)
        getHandle.registerTimer(tv.getCurrentProcessingTimeInMs() + idleMs)
        Iterator.empty
      }
    }
    override def handleExpiredTimer(key: Long,
        tv: org.apache.spark.sql.streaming.TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[FlushOut] = {
      if (!st.exists()) Iterator.empty
      else {
        val acc = st.get()
        st.clear()
        if (acc.n > 0L) Iterator.single(FlushOut(key, acc.n, acc.total, "timer"))
        else Iterator.empty
      }
    }
  }

  def idleFlushTws(events: Dataset[(Long, Long)], idleMs: Long): Dataset[FlushOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .transformWithState(new IdleFlushProcessor(idleMs),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(), OutputMode.Update())
  }

  def sessionizeTws(events: Dataset[SessEv], gapSec: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 seconds")
      .groupByKey(_.user_id)
      .transformWithState(new SessionizeProcessor(gapSec),
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append())
  }

  final case class SessEv(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessState(start_sec: Long, last_sec: Long, n: Long, sum: java.math.BigDecimal)
  final case class SessionOut(user_id: Long, start_sec: Long, end_sec: Long,
      n_events: Long, sum_value: Double)

  /** True streaming sessionization: gap-close via flatMapGroupsWithState
    * with an event-time timeout — the streaming twin of Events.sessionize.
    * A session is emitted when the watermark passes its last event + gap.
    * State per user is O(1) (one open session); the decimal accumulator
    * matches the batch dsum exactly. Events inside one micro-batch are
    * sorted by event time before merging (cross-batch order is guaranteed
    * by the watermark). */
  def sessionize(events: Dataset[SessEv], gapSec: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[SessEv], state: GroupState[SessState]) =>
          def close(s: SessState): SessionOut =
            SessionOut(uid, s.start_sec, s.last_sec, s.n, s.sum.doubleValue())
          if (state.hasTimedOut) {
            val out = close(state.get)
            state.remove()
            Iterator.single(out)
          } else {
            val sorted = rows.toIndexedSeq.sortBy(_.ts.getTime)
            val closed = Iterator.unfold(
              (state.getOption, sorted.iterator)) { case (open, it) =>
              if (!it.hasNext) {
                open.foreach { s =>
                  state.update(s)
                  state.setTimeoutTimestamp(math.max(
                    (s.last_sec + gapSec) * 1000L,
                    state.getCurrentWatermarkMs() + 1))
                }
                None
              } else {
                val e = it.next()
                val sec = e.ts.getTime / 1000L
                val v = java.math.BigDecimal.valueOf(e.value).setScale(4)
                open match {
                  case Some(s) if sec - s.last_sec < gapSec =>
                    Some((None, (Some(SessState(s.start_sec, sec, s.n + 1, s.sum.add(v))), it)))
                  case Some(s) =>
                    Some((Some(close(s)), (Some(SessState(sec, sec, 1L, v)), it)))
                  case None =>
                    Some((None, (Some(SessState(sec, sec, 1L, v)), it)))
                }
              }
            }.flatten.toVector
            closed.iterator
          }
      }
  }

  /** Streaming twin of the FLAGSHIP query — zonal statistics over a point
    * stream, per event-time window: the reference's core computation
    * (stats.py) on the ingest path. The zone join runs BEFORE the
    * aggregation: cell-bucketed equi-join (same plan as the batch
    * Geo.pointZoneJoinOn, stateless) then ONE watermarked stateful
    * aggregation keyed (window, zone) — state is bounded by
    * #zones x watermark horizon. Counts and exact long-cents sums match
    * the batch operator bit for bit (same accumulation discipline).
    * At 100 TB ingest the pre-join cell partials variant (chained
    * stateful aggs, Spark >= 3.4 append mode) cuts the join volume; the
    * single-agg form is the portable baseline. */
  def zonalStats(points: DataFrame, zones: DataFrame): DataFrame = {
    // cell size and the exact-cents accumulator are SHARED with the batch
    // operator (graft.operators.Geo) — a divergence there must break
    // compilation or the parity spec, never silently fork the semantics
    import graft.operators.Geo.{CellW, CellH, valueCents, centsToDouble}
    val z = zones
      .withColumn("cx", explode(expr(
        s"sequence(CAST(floor(xmin / $CellW) AS INT), CAST(floor(xmax / $CellW) AS INT))")))
      .withColumn("cy", explode(expr(
        s"sequence(CAST(floor(ymin / $CellH) AS INT), CAST(floor(ymax / $CellH) AS INT))")))
    points
      .withWatermark("ts", "2 hours")
      .withColumn("cx", floor(col("lon") / lit(CellW)).cast("int"))
      .withColumn("cy", floor(col("lat") / lit(CellH)).cast("int"))
      .join(broadcast(z), Seq("cx", "cy"))
      .filter(col("lon") >= col("xmin") && col("lon") < col("xmax")
        && col("lat") >= col("ymin") && col("lat") < col("ymax"))
      .groupBy(window(col("ts"), "1 hour"), col("zone_id"))
      .agg(
        count(lit(1)).as("n_points"),
        (centsToDouble(sum(valueCents)) / count(lit(1))).as("mean_value"))
      .select(unix_timestamp(col("window.start")).as("hour_epoch"),
        col("zone_id"), col("n_points"), col("mean_value"))
  }

  /** Streaming exact dedup — the streaming twin of Dedup.exactOn for a
    * continuously-ingested corpus: drop duplicate texts by md5 content
    * hash with dropDuplicatesWithinWatermark, so the hash-key state is
    * EVICTED once the watermark passes (plain dropDuplicates on a stream
    * keys state forever — the unbounded-state trap at 100 TB ingest).
    * First arrival wins within the dedup horizon. */
  def dedupDocs(docs: DataFrame, horizon: String = "10 minutes"): DataFrame =
    docs
      .withColumn("text_hash", md5(col("text")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("text_hash")

  final case class AbsEv(user_id: Long, event_id: Long, etype: String,
    ts: java.sql.Timestamp)
  final case class AbsPending(event_id: Long, ea: Long)
  final case class AbsState(pending: List[AbsPending])
  final case class AbsenceOut(user_id: Long, event_id: Long, ea_sec: Long,
    followed: Boolean, lag_sec: Long) // lag_sec = -1 when absent

  /** Streaming absence detection — the streaming twin of Events.absence
    * ("A not followed by B within T"): per-user state holds the OPEN A
    * events (bounded: only those within the last T seconds — a real
    * cart-abandonment monitor's working set), a B event closes every
    * open A whose (ea, ea+T] window contains it (emitted immediately,
    * `followed` with the lag), and an event-time timeout fires the
    * ABSENT verdicts once the watermark proves no qualifying B can
    * arrive. This timeout-driven negative emission is the one CEP shape
    * a stream-stream join cannot express (a join can only emit matches;
    * absence needs state + timers). Same within-batch event-time sort
    * and cross-batch watermark-order caveat as sessionize above. */
  def absenceDetect(events: Dataset[AbsEv], aType: String, bType: String,
      timeoutSec: Long): Dataset[AbsenceOut] = {
    import events.sparkSession.implicits._
    events
      .filter(e => e.etype == aType || e.etype == bType)
      .withWatermark("ts", "10 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AbsState, AbsenceOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[AbsEv], state: GroupState[AbsState]) =>
          // expiry is conservative by one second: a qualifying B can carry
          // sub-second precision up to the END of second ea+T, so an A is
          // only absent once the watermark clears (ea+T+1)*1000 ms
          def expiryMs(p: AbsPending): Long = (p.ea + timeoutSec + 1) * 1000L
          def arm(pending: List[AbsPending]): Unit =
            if (pending.isEmpty) state.remove()
            else {
              state.update(AbsState(pending))
              state.setTimeoutTimestamp(math.max(
                pending.map(expiryMs).min, state.getCurrentWatermarkMs() + 1))
            }
          if (state.hasTimedOut) {
            val wm = state.getCurrentWatermarkMs()
            val (expired, live) = state.getOption.map(_.pending).getOrElse(Nil)
              .partition(p => expiryMs(p) <= wm)
            val out = expired.map(p => AbsenceOut(uid, p.event_id, p.ea, false, -1L))
            arm(live)
            out.iterator
          } else {
            // A before B on a whole-second tie: ties can't match anyway
            // (strict eb > ea), but deterministic order keeps replays stable
            val sorted = rows.toIndexedSeq
              .sortBy(e => (e.ts.getTime, e.etype, e.event_id))
            var pending = state.getOption.map(_.pending).getOrElse(Nil)
            val out = scala.collection.mutable.ArrayBuffer.empty[AbsenceOut]
            sorted.foreach { e =>
              val sec = e.ts.getTime / 1000L
              if (e.etype == aType) pending = pending :+ AbsPending(e.event_id, sec)
              else {
                val (matched, rest) =
                  pending.partition(p => sec > p.ea && sec <= p.ea + timeoutSec)
                out ++= matched.map(p =>
                  AbsenceOut(uid, p.event_id, p.ea, true, sec - p.ea))
                pending = rest
              }
            }
            arm(pending)
            out.iterator
          }
      }
  }

  /** Stream-stream interval join — the streaming twin of the batch
    * time-range join (AsofJoin.purchaseClicksInWindow): purchases matched
    * to the same user's clicks in the preceding hour, both sides live
    * streams. The join condition is time-BOUNDED on watermarked columns,
    * so Spark evicts click state once `c_ts` falls behind the purchase
    * watermark minus the interval — bounded state at ingest scale, where
    * an unbounded-condition stream join would buffer every click forever.
    * Emitted unaggregated (append mode); the windowed aggregation is a
    * chained stateful op downstream when needed. */
  def intervalJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("value").as("c_value"))
      .withWatermark("c_ts", "2 hours")
    val p = purchases
      .select(col("user_id"), col("event_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    p.join(c, col("user_id") === col("c_user")
        && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
        && col("c_ts") < col("p_ts"))
      .select(col("event_id"), col("user_id"), col("p_ts"), col("c_ts"), col("c_value"))
  }

  /** LEFT-OUTER stream-stream interval join — the variant the inner join
    * cannot express: a purchase with NO click in its preceding hour still
    * emits (with null click columns) once the click-side watermark passes
    * the purchase's join bound, proving the absence. Same time-bounded
    * condition and state-eviction contract as intervalJoin; the null row
    * is withheld exactly until the watermark makes "no match can still
    * arrive" a fact, which is why outer stream joins REQUIRE the
    * watermark + time bound (unbounded conditions would never emit). */
  def intervalJoinOuter(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("value").as("c_value"))
      .withWatermark("c_ts", "2 hours")
    val p = purchases
      .select(col("user_id"), col("event_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    p.join(c, col("user_id") === col("c_user")
        && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
        && col("c_ts") < col("p_ts"), "leftOuter")
      .select(col("event_id"), col("user_id"), col("p_ts"), col("c_ts"), col("c_value"))
  }

  /** Stream-static ANN probe routing — the streaming twin of
    * Similarity.multiprobe's centroid-ranking stage: a live stream of
    * query embeddings is routed to its `probeP` nearest trained clusters
    * by the SAME exact-integer distance the batch Lloyd rounds use
    * (p = sum_i (xq_i*n - S_i)^2 over milli-unit coords, compared as
    * p/n^2 — one correctly-rounded double division, the batch ordering
    * verbatim). The codebook (c, i, cS, n — k x 64 rows from
    * Similarity.trainedCodebook) is packed into ONE static row of
    * array<struct> and broadcast, so the whole routing is a STATELESS
    * map stage: no watermark, no state growth with ingest, and
    * per-query cost O(k x dims) behind the broadcast. Streams can't run
    * ranking windows; the top-P cut is array_sort + slice over the k
    * candidate structs (array_sort orders by (d, c) — the window's
    * ORDER BY d ASC, c ASC). Downstream, each (qid, c) row reads only
    * the probed partitions of a c-clustered corpus layout — the
    * disk-resident IVF shard pattern at ingest time. */
  def annProbeRoute(queries: DataFrame, codebook: DataFrame, probeP: Int): DataFrame = {
    // one row: every centroid as (c, n, s = 64 dim-ordered sums)
    val packed = codebook
      .groupBy("c").agg(max("n").as("n"),
        expr("transform(array_sort(collect_list(struct(i, cS))), e -> e.cS)").as("s"))
      .agg(expr("array_sort(collect_list(struct(c, n, s)))").as("cents"))
      .withColumn("jk", lit(1))
    queries
      .withColumn("jk", lit(1))
      .join(broadcast(packed), Seq("jk")) // stream-static inner equi-join
      .withColumn("xq", expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT))"))
      .withColumn("ranked", expr(
        s"""slice(array_sort(transform(cents, ct -> struct(
           |  CAST(aggregate(sequence(0, size(xq) - 1), CAST(0 AS BIGINT), (acc, k) ->
           |    acc + (element_at(xq, k + 1) * ct.n - element_at(ct.s, k + 1))
           |        * (element_at(xq, k + 1) * ct.n - element_at(ct.s, k + 1))) AS DOUBLE)
           |    / (CAST(ct.n AS DOUBLE) * CAST(ct.n AS DOUBLE)) AS d,
           |  ct.c AS c))), 1, $probeP)""".stripMargin))
      .select(col("qid"), posexplode(col("ranked")).as(Seq("pos", "pr")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("probe_rank"), col("pr.c").as("c"))
  }

  /** STREAMING ARTIFACT DEPLOY — score a document stream against a
    * PERSISTED batch-trained model: the train-batch/serve-stream split
    * every production quality gate runs (the model is ta_nb_train's
    * 256-row odds table, written to parquet once by a batch job; the
    * stream reads it back as a STATIC side). The whole scorer is a
    * STATELESS map stage: the model packs into one broadcast row as a
    * bucket->odds map (the annProbeRoute packing rule — streams cannot
    * run ranking windows or re-aggregate per doc without state, so the
    * per-doc mean runs as an array fold INSIDE the row), features are
    * the same hashed word bigrams the batch trainer counted (one shared
    * bucket hash), unseen buckets score the add-one-smoothed neutral
    * odds (0+1)*10000 div (0+1) = 10000, and keep = mean odds >= 10000
    * (more likely positive than negative under the NB model). No
    * watermark, no state growth with ingest; replaying a micro-batch
    * reproduces identical scores (pure function of row x artifact) —
    * the idempotence that lets the gate run at-least-once. Batch parity
    * against an independently-shaped explode+join+groupBy plan is
    * spec-pinned (StreamingSpec). */
  def nbScoreStream(docs: DataFrame, model: DataFrame): DataFrame = {
    val packed = model
      .agg(expr("map_from_entries(collect_list(struct(bucket, odds_x10000)))").as("m"))
      .withColumn("jk", lit(1))
    docs
      .withColumn("jk", lit(1))
      .join(broadcast(packed), Seq("jk")) // stream-static inner equi-join
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 2)
      .withColumn("bs", expr(
        "transform(sequence(0, size(ws) - 2), i -> " +
          "CAST(conv(substring(md5(concat('hc:', " +
          "concat(element_at(ws, i + 1), ' ', element_at(ws, i + 2)))), 1, 4), 16, 10) AS BIGINT) " +
          s"% ${graft.operators.TextAnalysis.HcBuckets})"))
      .withColumn("sw", expr(
        "aggregate(bs, CAST(0 AS BIGINT), (acc, b) -> " +
          "acc + coalesce(element_at(m, b), CAST(10000 AS BIGINT)))"))
      .select(col("doc_id"),
        expr("sw div size(bs)").as("odds_x10000"),
        (expr("sw div size(bs)") >= lit(10000L)).as("keep"))
  }

  /** Batch twin of nbScoreStream, built the OTHER way (explode features,
    * broadcast-join the model table, per-doc groupBy) — exists so the
    * parity spec compares two independently-derived plans, not one plan
    * with itself. */
  def nbScoreBatch(docs: DataFrame, model: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"),
        explode(expr("transform(sequence(0, size(ws) - 2), " +
          "i -> concat(element_at(ws, i + 1), ' ', element_at(ws, i + 2)))")).as("f"))
      .withColumn("bucket", expr(
        s"CAST(conv(substring(md5(concat('hc:', f)), 1, 4), 16, 10) AS BIGINT) " +
          s"% ${graft.operators.TextAnalysis.HcBuckets}"))
      .join(broadcast(model.select(col("bucket"), col("odds_x10000").as("odds"))),
        Seq("bucket"), "left_outer")
      .groupBy("doc_id")
      .agg(expr("sum(coalesce(odds, CAST(10000 AS BIGINT))) div count(1)").as("odds_x10000"))
      .select(col("doc_id"), col("odds_x10000"),
        (col("odds_x10000") >= lit(10000L)).as("keep"))

  final case class RsvEv(user_id: Long, event_id: Long, hv: Long)
  final case class RsvState(items: List[(Long, Long)], n_seen: Long)
  final case class RsvOut(user_id: Long, n_seen: Long, event_ids: Seq[Long])

  /** STREAMING BOTTOM-K RESERVOIR — ev_reservoir's state kept online:
    * per user, the K events with the lowest md5-derived hash rank, as a
    * mapGroupsWithState whose per-key state is a bounded K-list (O(keys
    * x K), never O(ingest)). The bottom-K set is a MERGE-closed sketch —
    * bottom-K(union) = bottom-K(bottom-Ks) — so the final state is
    * independent of micro-batch boundaries AND arrival order; the spec
    * feeds the same events forwards and reversed and pins identical
    * reservoirs, both equal to the batch query's. n_seen stamps each
    * update so a consumer (and the spec) can pick the newest row per
    * key from an Update-mode sink. */
  final case class Scd2Ev(user_id: Long, event_type: String,
      ts: java.sql.Timestamp, event_id: Long, value: Double)
  final case class Scd2State(version: Long, from_sec: Long, value: Double)
  final case class Scd2Closed(user_id: Long, event_type: String, version: Long,
      value: Double, valid_from_sec: Long, valid_to_sec: Long)

  /** Streaming SCD2 history builder — the streaming twin of
    * Events.cdcScd2: each arriving upsert CLOSES the key's open version
    * (valid_to = the newcomer's valid_from) and opens its own. Closed
    * versions emit in Append mode the moment they close; the open row
    * lives only in state (one record per key — O(keys), never history-
    * sized: the history already streamed out). Within a micro-batch
    * events sort by (event time, event_id) — the batch operator's exact
    * version order; across batches the in-order feed + watermark carry
    * the guarantee (SCD2 is inherently order-DEPENDENT, unlike the
    * merge-closed reservoir). Round15Spec replays the same feed under
    * different batch boundaries and pins identical closed history,
    * equal to the batch operator's non-current rows. */
  def scd2Stream(updates: Dataset[Scd2Ev]): Dataset[Scd2Closed] = {
    import updates.sparkSession.implicits._
    updates
      .withWatermark("ts", "10 seconds")
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[Scd2State, Scd2Closed](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((uid, et), rows, state) =>
          // whole-second key: the batch operator versions by (ts_sec,
          // event_id) — millisecond ordering would flip same-second pairs
          val sorted = rows.toIndexedSeq.sortBy(e => (e.ts.getTime / 1000L, e.event_id))
          var open = state.getOption
          val out = Vector.newBuilder[Scd2Closed]
          for (e <- sorted) {
            val sec = e.ts.getTime / 1000L
            open.foreach { s =>
              out += Scd2Closed(uid, et, s.version, s.value, s.from_sec, sec)
            }
            open = Some(Scd2State(open.map(_.version).getOrElse(0L) + 1L, sec, e.value))
          }
          open.foreach(state.update)
          out.result().iterator
      }
  }

  def reservoirStream(events: Dataset[RsvEv], k: Int): Dataset[RsvOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[RsvState, RsvOut](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[RsvEv], state: GroupState[RsvState]) =>
          val prev = state.getOption.getOrElse(RsvState(Nil, 0L))
          var n = prev.n_seen
          val merged = rows.foldLeft(prev.items) { (acc, e) =>
            n += 1
            ((e.hv, e.event_id) :: acc).sorted.take(k)
          }
          val next = RsvState(merged, n)
          state.update(next)
          RsvOut(uid, n, merged.map(_._2).sorted) // canonical id order
      }
  }

  /** foreachBatch keyed UPSERT into a bucket-partitioned parquet table —
    * the streaming sink pattern when the store is plain parquet (no
    * transactional table format in this environment): merge each
    * micro-batch into ONLY the bucket partitions it touches via dynamic
    * partition overwrite. Latest (ts, value) wins per key — a map-side-
    * combinable struct-max, no per-key window. The merge is a pure
    * function of (current partition contents, batch), so REPLAYING a
    * micro-batch after a sink-side crash rewrites identical contents —
    * effectively-once semantics without a transactional store. The merged
    * frame is eagerly localCheckpoint-ed before the overwrite because its
    * lineage reads the very files the write replaces. At scale the bucket
    * count bounds write amplification: a batch touching any number of keys
    * rewrites at most nBuckets partitions, never the whole table. */
  def upsertBatch(spark: SparkSession, batch: DataFrame, tablePath: String, nBuckets: Int = 16): Unit = {
    if (batch.isEmpty) return
    val upd = batch.select(col("user_id"), col("ts"), col("value"))
      .withColumn("bucket", pmod(col("user_id"), lit(nBuckets.toLong)))
    // bounded driver-side list (<= nBuckets entries, never O(rows))
    val touched = upd.select("bucket").distinct().collect().map(_.getLong(0))
    val p = new org.apache.hadoop.fs.Path(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // probe for COMMITTED data, not mere directory existence: a crash
    // during the very first write leaves tablePath with only _temporary —
    // treating that as "table exists" would crash-loop the replay on an
    // unreadable read (bucket=* dirs and data files count; _temporary /
    // _SUCCESS do not)
    val hasData = fs.exists(p) &&
      fs.listStatus(p).exists(st => !st.getPath.getName.startsWith("_"))
    val current =
      if (hasData)
        spark.read.parquet(tablePath).filter(col("bucket").isin(touched: _*))
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], upd.schema)
    val merged = current.unionByName(upd)
      .groupBy("bucket", "user_id")
      .agg(max(struct(col("ts"), col("value"))).as("m"))
      .select(col("bucket"), col("user_id"), col("m.ts").as("ts"), col("m.value").as("value"))
      .localCheckpoint() // eager: cut lineage off the files the write replaces
    val saved = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.write.mode("overwrite").partitionBy("bucket").parquet(tablePath)
    finally saved match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Wire upsertBatch as a streaming sink. */
  def upsertStream(spark: SparkSession, updates: DataFrame, tablePath: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    updates.writeStream.outputMode(OutputMode.Update())
      .foreachBatch((b: DataFrame, _: Long) => upsertBatch(spark, b, tablePath))

  /** Convenience: run a streaming DataFrame to completion against an
    * in-memory sink and return the result table. Test/dev harness only. */
  /** Streaming COUNT-MIN SKETCH maintenance — the streaming twin of
    * Events.heavyHitters' sketch build: every arriving event increments
    * its d=CmsRows md5-hashed cells, and the running aggregation state
    * IS the sketch — d x w = 256 cells, bounded BY CONSTRUCTION no
    * matter how long the stream runs or how many distinct keys it
    * carries (the reason CMS exists: per-key streaming state would grow
    * with cardinality, the sketch does not, and cells merge by + across
    * executors and restarts). Complete-mode output ships the current
    * cell grid each micro-batch; a consumer probes it with MIN over a
    * key's d cells exactly like the batch query. Cell parity with the
    * batch plan over the same events is spec-pinned (one shared bucket
    * definition, Events.CmsBucketSql). */
  def cmsCells(events: DataFrame): DataFrame =
    events
      .select(col("user_id"),
        explode(expr(s"sequence(0, ${graft.operators.Events.CmsRows - 1})")).as("r"))
      .withColumn("bucket", expr(graft.operators.Events.CmsBucketSql))
      .groupBy("r", "bucket").agg(count(lit(1)).as("cell"))

  /** Streaming HYPERLOGLOG register maintenance — the distinct-count
    * twin of cmsCells above: every arriving (event_type, user) pair
    * updates its bucket's register by MAX(rho), and the aggregation
    * state is the <= types x 16 register table — bounded by
    * construction, merging by MAX across executors and restarts (what
    * a streaming COUNT DISTINCT ships instead of user sets). No
    * pre-dedup is needed: MAX over repeats equals MAX over distincts —
    * the idempotence that makes HLL registers safe under replay
    * (at-least-once delivery cannot inflate them, unlike a counter).
    * Register parity with the batch ev_hll build is spec-pinned over
    * the shared bit expansion. */
  def hllRegisters(events: DataFrame): DataFrame = {
    val bits = (2 to 13)
      .map(k => graft.operators.Events.hexBitsSql("mh", k))
      .mkString("concat(", ", ", ")")
    events
      .withColumn("mh", md5(concat(lit("hll:"), col("user_id").cast("string"))))
      .withColumn("bucket", expr("CAST(conv(substr(mh, 1, 1), 16, 10) AS BIGINT)"))
      .withColumn("rho", expr(s"CAST(CASE WHEN position('1' IN $bits) = 0 " +
        s"THEN 49 ELSE position('1' IN $bits) END AS BIGINT)"))
      .groupBy("event_type", "bucket")
      .agg(max(col("rho")).as("register"))
  }

  /** Streaming BLOOM-FILTER maintenance — the third mergeable sketch
    * next to cmsCells and hllRegisters: every arriving document sets
    * its k md5 positions, and the streaming state is the distinct-
    * positions table — bounded at m = BloomScreenBits rows BY
    * CONSTRUCTION no matter how many documents stream through (set
    * bits merge by set-union, idempotent under replay like the HLL
    * MAX). Append-mode output emits each position exactly once, when
    * first set; the emitted set equals the batch screen's bit table
    * over the same documents (spec-pinned over the one shared position
    * definition). */
  def bloomBits(docs: DataFrame): DataFrame = {
    val positions = (0 until graft.operators.Dedup.BloomScreenK)
      .map(j => s"(${graft.operators.Dedup.bloomPosExpr(j)})")
      .mkString("array(", ", ", ")")
    docs
      .withColumn("h", md5(col("text")))
      .select(explode(expr(positions)).as("pos"))
      .dropDuplicates("pos")
  }

  def runToMemory(spark: SparkSession, df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
