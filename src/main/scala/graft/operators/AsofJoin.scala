package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables._

/** As-of (point-in-time) join — an operator Spark's built-ins lack.
  *
  * Implemented the scalable single-shuffle way: tag both streams, union,
  * and run one window per key ordered by (time, tag) taking the last
  * non-null right-side attributes at-or-before each left row. Compared to a
  * range-join + groupBy-max (which explodes candidates) or a per-key
  * collect (which doesn't distribute), this is one shuffle on the key and
  * one sort — the same plan a 100 TB backfill join would use, with AQE
  * handling key skew.
  *
  * Tie rule: right rows sort before left rows at equal timestamps, so the
  * match is inclusive (right.t <= left.t) — exactly DuckDB's ASOF JOIN
  * semantics, which the oracle uses natively.
  */
object AsofJoin {

  /** Generic core. left must carry (`keyCol`, `timeCol`); right must carry
    * (`keyCol`, `timeCol`, attr columns). Returns left rows + the latest
    * right attrs (null when no right row is at-or-before). */
  def asofOn(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
      rightAttrs: Seq[String]): DataFrame = {
    val rTagged = right.select(
      Seq(col(keyCol), col(timeCol), lit(0).as("side")) ++
        Seq(col(timeCol).as("asof_time")) ++
        rightAttrs.map(a => col(a).as(s"asof_$a")) ++
        left.columns.filterNot(c => c == keyCol || c == timeCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      Seq(col(keyCol), col(timeCol), lit(1).as("side")) ++
        Seq(lit(null).cast(right.schema(timeCol).dataType).as("asof_time")) ++
        rightAttrs.map(a => lit(null).cast(right.schema(a).dataType).as(s"asof_$a")) ++
        left.columns.filterNot(c => c == keyCol || c == timeCol).map(col): _*)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(timeCol).asc, col("side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rTagged.unionByName(lTagged)
      .withColumn("asof_time_f", last(col("asof_time"), ignoreNulls = true).over(w))
    val withAttrs = rightAttrs.foldLeft(filled) { (df, a) =>
      df.withColumn(s"asof_${a}_f", last(col(s"asof_$a"), ignoreNulls = true).over(w))
    }
    withAttrs.filter(col("side") === 1)
      .select(
        Seq(col(keyCol), col(timeCol)) ++
          left.columns.filterNot(c => c == keyCol || c == timeCol).map(col) ++
          Seq(col("asof_time_f").as("asof_time")) ++
          rightAttrs.map(a => col(s"asof_${a}_f").as(s"asof_$a")): _*)
  }

  /** q14: for every purchase event, the user's most recent click at or
    * before it (classic point-in-time feature join: "state of X when Y
    * happened"). */
  def purchaseAsofClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("sec"),
        col("event_type"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("sec"), col("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("sec"), col("value"))
    asofOn(purchases, clicks, "user_id", "sec", Seq("value"))
      .select(col("event_id"), col("user_id"), col("sec").as("purchase_sec"),
        col("asof_time").as("last_click_sec"), col("asof_value").as("last_click_value"))
      .orderBy("event_id")
  }

  /** q17: time-range join — clicks in the hour before each purchase, per
    * user. Planned like the spatial join: bucket time into cells sized to
    * the range (1h), replicate the left side onto the <=2 covering cells,
    * equi-join on (user, cell) + exact range predicate. At 100 TB both
    * sides shuffle on (user, cell); no inequality-only join ever runs. */
  def purchaseClicksInWindow(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("sec"),
        col("event_type"), col("value"))
    val win = 3600L
    val purchases = ev.filter(col("event_type") === "purchase")
      .withColumn("cell", explode(array((col("sec") / win).cast("long") - 1,
        (col("sec") / win).cast("long"))))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), (col("sec") / win).cast("long").as("cell"),
        col("sec").as("c_sec"), col("value").as("c_value"))
    purchases.join(clicks, Seq("user_id", "cell"))
      .filter(col("c_sec") >= col("sec") - win && col("c_sec") < col("sec"))
      .groupBy(col("event_id"), col("user_id"), col("sec").as("purchase_sec"))
      .agg(count(lit(1)).as("n_clicks"), dsum(col("c_value")).as("sum_click_value"))
      .orderBy("event_id")
  }

  /** q14 on the NATIVE merge operator (graft.plans.AsofJoinExec): same
    * semantics, but the physical plan streams both sorted sides once with
    * a forward merge pointer instead of sorting a tagged union — one
    * shuffle per side, O(1) merge state per partition. The oracle is the
    * same DuckDB ASOF LEFT JOIN. */
  def purchaseAsofClickNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("sec"),
        col("event_type"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("sec"), col("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("sec"), col("value"))
    graft.plans.AsofJoinNative.asof(purchases, clicks, "user_id", "sec", Seq("value"))
      .select(col("event_id"), col("user_id"), col("sec").as("purchase_sec"),
        col("asof_time").as("last_click_sec"), col("asof_value").as("last_click_value"))
      .orderBy("event_id")
  }

  /** q29: MULTI-GROUP POINT-IN-TIME FEATURE JOIN — the feature-store
    * shape q14 is one slice of: for every purchase (the training-label
    * entity), features from TWO groups at different grains, each
    * STRICTLY before the purchase instant (the leakage rule that makes
    * offline features match what online serving could have known):
    *   group 1 (event grain, cumulative): clicks before the purchase —
    *     count + exact cents. One sweep window per user ordered by the
    *     unique (sec, kind, event_id) with purchases sorted BEFORE
    *     same-second clicks, so the running sums exclude same-instant
    *     activity by construction, never by a fragile < filter on ties.
    *   group 2 (session grain): the user's last CLOSED session
    *     (ev_sessionize's 30-min-gap sessions) — size + end time via
    *     as-of on end_sec + 1 (closed strictly before; the purchase's
    *     own still-open session can never leak in). No-history
    *     purchases keep deterministic sentinels (0 / -1).
    *
    * Scale: both groups are one user-partitioned pass (window fan-in
    * bounded per user; sub-bucket by day at 100 TB — the
    * ev_concurrency prefix rule); the as-of is the tagged-union merge,
    * one shuffle per side, no per-entity scan. */
  def pitFeatures(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("sec"),
        col("event_type"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("sec"), col("event_id"), lit(1L).as("kind"),
        lit(1L).as("is_c"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
    val pur = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("sec"), col("event_id"), lit(0L).as("kind"),
        lit(0L).as("is_c"), lit(0L).as("cents"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("sec").asc, col("kind").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val g1 = clicks.unionByName(pur)
      .withColumn("n_clicks_before", sum(col("is_c")).over(w))
      .withColumn("click_cents_before", sum(col("cents")).over(w))
      .filter(col("kind") === 0L)
      .select(col("user_id"), col("sec"), col("event_id"),
        col("n_clicks_before"), col("click_cents_before"))
    val sess = graft.operators.Events.sessionFrame(spark, dir)
      .select(col("user_id"), (col("end_sec") + 1L).as("sec"),
        col("n_events").as("sess_events"), col("end_sec"))
    asofOn(g1, sess, "user_id", "sec", Seq("sess_events", "end_sec"))
      .select(col("event_id"), col("user_id"), col("sec").as("purchase_sec"),
        col("n_clicks_before"), col("click_cents_before"),
        coalesce(col("asof_sess_events"), lit(0L)).as("last_sess_events"),
        coalesce(col("asof_end_sec"), lit(-1L)).as("last_sess_end_sec"))
      .orderBy("event_id")
  }

  private val pitOracleSql =
    """WITH ev AS (
      |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |    event_type, value
      |  FROM events
      |),
      |u AS (
      |  SELECT user_id, sec, event_id, 1 AS kind, 1 AS is_c,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM ev WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT user_id, sec, event_id, 0, 0, 0
      |  FROM ev WHERE event_type = 'purchase'
      |),
      |g1 AS (
      |  SELECT user_id, sec, event_id, kind,
      |    CAST(SUM(is_c) OVER w AS BIGINT) AS n_clicks_before,
      |    CAST(SUM(cents) OVER w AS BIGINT) AS click_cents_before
      |  FROM u WINDOW w AS (PARTITION BY user_id
      |    ORDER BY sec ASC, kind ASC, event_id ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |),
      |p AS (
      |  SELECT user_id, sec, event_id, n_clicks_before, click_cents_before
      |  FROM g1 WHERE kind = 0
      |),
      |f AS (
      |  SELECT user_id, event_id, ts_sec,
      |    CASE WHEN prev_sec IS NULL OR ts_sec - prev_sec >= 1800
      |      THEN 1 ELSE 0 END AS new_session
      |  FROM (
      |    SELECT user_id, event_id, sec AS ts_sec,
      |      LAG(sec, 1) OVER (PARTITION BY user_id ORDER BY sec ASC, event_id ASC)
      |        AS prev_sec
      |    FROM ev)
      |),
      |h AS (
      |  SELECT user_id, ts_sec, CAST(SUM(new_session) OVER (PARTITION BY user_id
      |    ORDER BY ts_sec ASC, event_id ASC) AS BIGINT) AS session_idx
      |  FROM f
      |),
      |sess AS (
      |  SELECT user_id, MAX(ts_sec) + 1 AS t, COUNT(*) AS sess_events,
      |    MAX(ts_sec) AS end_sec
      |  FROM h GROUP BY user_id, session_idx
      |),
      |j AS (
      |  SELECT p.event_id, p.user_id, p.sec AS purchase_sec,
      |    p.n_clicks_before, p.click_cents_before, s.sess_events, s.end_sec
      |  FROM p ASOF LEFT JOIN sess s ON p.user_id = s.user_id AND s.t <= p.sec
      |)
      |SELECT event_id, user_id, purchase_sec, n_clicks_before,
      |  click_cents_before,
      |  COALESCE(sess_events, 0) AS last_sess_events,
      |  COALESCE(end_sec, -1) AS last_sess_end_sec
      |FROM j ORDER BY event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_pit_features" -> (pitFeatures _),
    "q14_asof_join" -> (purchaseAsofClick _),
    "q14_asof_native" -> (purchaseAsofClickNative _),
    "q17_range_join" -> (purchaseClicksInWindow _))

  private val asofOracleSql =
    """WITH ev AS (
      |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_type, value
      |  FROM events
      |),
      |p AS (SELECT user_id, sec, event_id FROM ev WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, sec AS c_sec, value FROM ev WHERE event_type = 'click')
      |SELECT p.event_id, p.user_id, p.sec AS purchase_sec,
      |  c.c_sec AS last_click_sec, c.value AS last_click_value
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.c_sec <= p.sec
      |ORDER BY p.event_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "q29_pit_features" -> pitOracleSql,
    "q14_asof_native" -> asofOracleSql,
    "q17_range_join" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_type, value
        |  FROM events
        |),
        |p AS (SELECT user_id, event_id, sec FROM ev WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, sec AS c_sec, value AS c_value FROM ev WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.sec AS purchase_sec,
        |  COUNT(*) AS n_clicks,
        |  CAST(SUM(CAST(c.c_value AS DECIMAL(18,4))) AS DOUBLE) AS sum_click_value
        |FROM p JOIN c ON p.user_id = c.user_id
        |  AND c.c_sec >= p.sec - 3600 AND c.c_sec < p.sec
        |GROUP BY 1, 2, 3 ORDER BY p.event_id""".stripMargin,
    "q14_asof_join" -> asofOracleSql)
}
