package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Parity.stableRound

/** Event-time operators over the `events` table. Time arithmetic is
  * done on the exact int64 nanosecond column (`ts_ns`, see
  * [[graft.core.Tables.events]]) so the DuckDB oracle (epoch_ns)
  * reproduces every boundary decision bit-for-bit.
  */
object Events {

  /** 30 minutes in nanoseconds — the sessionization gap. */
  val SessionGapNs: Long = 30L * 60 * 1000000000L

  /** Gap-based sessionization: a new session starts when the gap to
    * the previous event of the same user exceeds 30 min. One shuffle
    * on user_id; both window passes share that partitioning. */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
    val newSession = when(
      col("ts_ns") - lag(col("ts_ns"), 1).over(byUser) > SessionGapNs, 1L)
      .otherwise(when(lag(col("ts_ns"), 1).over(byUser).isNull, 1L).otherwise(0L))
    e.select(col("user_id"), col("event_id"), col("ts_ns"),
        newSession.as("new_session"))
      .withColumn("session_idx",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .select("user_id", "event_id", "session_idx")
      .orderBy("user_id", "event_id")
  }

  // DuckDB sum(INTEGER) yields HUGEINT; the driver's hash is dtype-sensitive,
  // so every integer SUM in oracle SQL must be cast to ::BIGINT (SURVEY §6).
  val qSessionizeSql: String =
    s"""SELECT user_id, event_id, session_idx FROM (
       |  SELECT user_id, event_id,
       |    (sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_idx
       |  FROM (
       |    SELECT user_id, event_id, ts_ns,
       |      CASE WHEN ts_ns - lag(ts_ns) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id)
       |                > $SessionGapNs THEN 1
       |           WHEN lag(ts_ns) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id) IS NULL THEN 1
       |           ELSE 0 END AS new_session
       |    FROM (SELECT user_id, event_id, epoch_ns(ts) AS ts_ns FROM events) raw) flagged) t
       |ORDER BY user_id, event_id""".stripMargin

  /** As-of join: for each event, the latest order of the same user
    * (user_id = o_custkey) with order time ≤ event time; ties on the
    * same millisecond resolve to the highest orderkey.
    *
    * Spark has no as-of join operator, so this is the scalable
    * union-and-scan formulation: both sides union into one stream,
    * one shuffle on the user key, and a running `last(order, ignore
    * nulls)` window carries the most recent order forward into each
    * event row. O(n log n) per user partition — no range join, no
    * per-event subquery, and skew-safe under AQE. */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val orderSide = t.orders.select(
      col("o_custkey").as("user_id"),
      unix_millis(col("o_orderdate").cast("timestamp")).as("t_ms"),
      lit(0).as("kind"),
      lit(null).cast("long").as("event_id"),
      col("o_orderkey"))
    val eventSide = t.events.select(
      col("user_id"),
      expr("ts_ns div 1000000").as("t_ms"),
      lit(1).as("kind"),
      col("event_id"),
      lit(null).cast("long").as("o_orderkey"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t_ms").asc_nulls_first, col("kind").asc_nulls_first,
        col("o_orderkey").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)
    orderSide.unionByName(eventSide)
      .withColumn("asof_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select("event_id", "user_id", "asof_orderkey")
      .orderBy("event_id")
  }

  val qAsofJoinSql: String =
    """SELECT event_id, user_id, asof_orderkey FROM (
      |  SELECT user_id, kind, event_id,
      |    last_value(o_orderkey IGNORE NULLS) OVER (PARTITION BY user_id
      |      ORDER BY t_ms ASC NULLS FIRST, kind ASC NULLS FIRST, o_orderkey ASC NULLS FIRST
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_orderkey
      |  FROM (
      |    SELECT o_custkey AS user_id, epoch_ms(o_orderdate) AS t_ms, 0 AS kind,
      |      NULL::BIGINT AS event_id, o_orderkey
      |    FROM orders
      |    UNION ALL
      |    SELECT user_id, epoch_ns(ts) // 1000000 AS t_ms, 1 AS kind,
      |      event_id, NULL::BIGINT AS o_orderkey
      |    FROM events) u) t
      |WHERE kind = 1
      |ORDER BY event_id""".stripMargin

  /** Ordered funnel (view → click → purchase) per user: stage N's
    * timestamp is the FIRST qualifying event at-or-after stage N-1's —
    * the standard product-analytics funnel, not mere per-type minima.
    *
    * One shuffle total: all three stage columns are unordered MIN
    * windows over the same user_id partitioning (each referencing the
    * previous stage's column), so Catalyst plans a single exchange
    * with chained window passes and the per-user aggregate reuses it.
    * Output times are µs (integer div — ns values exceed double's 53
    * bits, so never divide through a double). */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val e = Tables(spark, dir).events.select(col("user_id"), col("event_type"), col("ts_ns"))
    e.withColumn("t1",
        min(when(col("event_type") === "view", col("ts_ns"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("ts_ns") >= col("t1"),
          col("ts_ns"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts_ns") >= col("t2"),
          col("ts_ns"))).over(w))
      .groupBy("user_id")
      .agg(
        expr("min(t1) div 1000").as("view_us"),
        expr("min(t2) div 1000").as("click_us"),
        expr("min(t3) div 1000").as("purchase_us"),
        when(min("t3").isNotNull, 3L)
          .when(min("t2").isNotNull, 2L)
          .when(min("t1").isNotNull, 1L).otherwise(0L).as("stage"))
      .filter(col("stage") >= 1)
      .orderBy("user_id")
  }

  val qFunnelSql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS ts_ns FROM events),
      |a AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ts_ns END)
      |        OVER (PARTITION BY user_id) AS t1 FROM e),
      |b AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts_ns >= t1 THEN ts_ns END)
      |        OVER (PARTITION BY user_id) AS t2 FROM a),
      |c AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts_ns >= t2 THEN ts_ns END)
      |        OVER (PARTITION BY user_id) AS t3 FROM b)
      |SELECT user_id,
      |  min(t1) // 1000 AS view_us,
      |  min(t2) // 1000 AS click_us,
      |  min(t3) // 1000 AS purchase_us,
      |  (CASE WHEN min(t3) IS NOT NULL THEN 3
      |        WHEN min(t2) IS NOT NULL THEN 2
      |        WHEN min(t1) IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS stage
      |FROM c
      |GROUP BY user_id
      |HAVING min(t1) IS NOT NULL
      |ORDER BY user_id""".stripMargin

  /** Band-join window width: 10 minutes in milliseconds. */
  val BandWindowMs: Long = 10L * 60 * 1000

  /** Range (band) join with NO equality key: for each event, the count
    * and total value of all events — any user — in the window
    * [t, t + 10 min). The reference's BTreeIndex serves this per-probe
    * via `between` (idx.rs:83-135); joining every row's own range is
    * the set version of that probe.
    *
    * Spark plans a raw inequality join as BroadcastNestedLoopJoin —
    * O(N·M) and a driver-memory bomb at scale — so this uses the
    * standard interval-binning rewrite: time is cut into buckets of
    * exactly the window width, each anchor interval registers in the
    * 1-2 buckets it overlaps (`sequence` + `explode`, replication
    * factor ≤ 2 by construction), each point lands in its single
    * bucket, and the join becomes a plain EQUI-join on bucket plus the
    * exact range predicate as a post-filter. A qualifying (anchor,
    * point) pair matches exactly one anchor copy — the one in the
    * point's bucket — so no dedup pass is needed. Buckets are
    * time-uniform, so the shuffle is skew-free; AQE handles residual
    * hot windows. PlanQualitySpec pins the no-nested-loop shape. */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val W = BandWindowMs
    val e = Tables(spark, dir).events
      .select(col("event_id"), expr("ts_ns div 1000000").as("t_ms"), col("value"))
    val anchors = e.select(col("event_id"), col("t_ms"),
      explode(sequence(expr(s"t_ms div $W"), expr(s"(t_ms + ${W - 1}) div $W")))
        .as("bucket"))
    val points = e.select(col("t_ms").as("p_ms"), col("value"),
      expr(s"t_ms div $W").as("bucket"))
    anchors.join(points,
        anchors("bucket") === points("bucket") &&
          col("p_ms") >= col("t_ms") && col("p_ms") < col("t_ms") + W)
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_window"),
        stableRound(sum("value"), 2).as("window_value"))
      .orderBy("event_id")
  }

  // DuckDB executes the inequality join directly (IEJoin); the binned
  // Spark plan must reproduce its exact pair set.
  val qRangeJoinSql: String =
    s"""WITH e AS (SELECT event_id, epoch_ns(ts) // 1000000 AS t_ms, value FROM events)
       |SELECT a.event_id,
       |  count(*)::BIGINT AS n_window,
       |  floor((sum(b.value)) * 1e2 + 0.5) / 1e2 AS window_value
       |FROM e a JOIN e b ON b.t_ms >= a.t_ms AND b.t_ms < a.t_ms + $BandWindowMs
       |GROUP BY a.event_id
       |ORDER BY a.event_id""".stripMargin

  /** Schema-on-read over the semi-structured `props` column: the JSON
    * payload parses through native `from_json` with an explicit schema
    * (JsonToStructs — codegen-friendly, no UDF), then a plain per-type
    * aggregation. Spark is LENIENT on malformed rows (they become
    * NULLs); DuckDB's `->>` / `::BIGINT` are STRICT and would error
    * the oracle instead — parity holds because the corpus is fully
    * well-formed, and a strict-side failure surfaces loudly as an
    * oracle error, never a silent mismatch. At scale the parse is
    * narrow map work fused into the scan stage and the aggregation is
    * one map-side-combining shuffle on event_type. */
  def qJsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
    e.select(col("event_type"),
        from_json(col("props"), "k BIGINT", Map.empty[String, String])
          .getField("k").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum("k").as("sum_k"),
        stableRound(sum("k") / count(lit(1)).cast("double"), 4).as("avg_k"))
      .orderBy("event_type")
  }

  val qJsonExtractSql: String =
    """SELECT event_type, count(*)::BIGINT AS n_events,
      |  sum((props->>'k')::BIGINT)::BIGINT AS sum_k,
      |  floor((sum((props->>'k')::BIGINT) / count(*)::DOUBLE) * 1e4 + 0.5) / 1e4 AS avg_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** One week of int64 nanoseconds — the retention bucket width. */
  val WeekNs = 7L * 86400L * 1000000000L

  /** q_retention — cohort retention matrix: users bucket into weekly
    * cohorts by their FIRST event week, and each (cohort week, offset
    * week) cell counts the distinct users active that many weeks
    * later — the standard product-analytics retention triangle. Week
    * arithmetic is exact integer division on ts_ns (both engines
    * divide the identical int64), never date truncation, so bucket
    * edges cannot drift between engines.
    *
    * Scale shape: three keyed shuffles, no windows — a map-side-
    * combined min per user (cohort), a user-keyed join attaching the
    * cohort to each event (both sides already user-keyed), and a
    * distinct over (cohort, offset, user) that partial-aggregates
    * map-side before the final cell count. Cells are O(weeks²) —
    * tiny — and per-user state is one long. */
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("user_id"), expr(s"ts_ns div $WeekNs").as("wk"))
    val cohorts = ev.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    ev.join(cohorts, "user_id")
      .select(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("offset_wk"),
        col("user_id"))
      .distinct()
      .groupBy("cohort_wk", "offset_wk")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_wk", "offset_wk")
  }

  val qRetentionSql: String =
    s"""WITH ev AS (SELECT user_id, epoch_ns(ts) // $WeekNs AS wk FROM events),
       |c AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY 1)
       |SELECT cohort_wk, wk - cohort_wk AS offset_wk,
       |  count(DISTINCT ev.user_id) AS n_users
       |FROM ev JOIN c USING (user_id)
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin

  /** One hour in nanoseconds — the resample grid step. */
  val ResampleStepNs: Long = 3600L * 1000000000L

  /** q_resample — time-series downsampling with gap fill: per user,
    * an hourly grid spanning that user's first→last event; each grid
    * hour carries the LAST event value in that hour (ts then event_id
    * tie-break), and empty hours FORWARD-FILL from the most recent
    * observed hour — the regularization step ahead of windowed
    * feature extraction or rate modeling on irregular event streams.
    *
    * Shape: one user_id shuffle shared by the per-hour last-pick
    * window, the per-user span aggregate, and the fill window; the
    * grid explodes from a `sequence` per user (span-bounded, no
    * driver loop, no cross join). Values are PICKED, never summed —
    * no float-parity machinery needed, the doubles ride through
    * bit-exact. Filled rows are flagged so downstream can weight
    * observed vs interpolated points. A NULL observed value counts as
    * a GAP on both sides (`last(…, ignoreNulls)` here, `value IS NOT
    * NULL` in the oracle's fill subquery): the hour is flagged filled
    * and carries the most recent non-null value. */
  def qResample(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), col("ts_ns"), col("value"))
      .withColumn("hour_bucket", expr(s"ts_ns div $ResampleStepNs"))
    val byHour = Window.partitionBy(col("user_id"), col("hour_bucket"))
      .orderBy(col("ts_ns").desc, col("event_id").desc)
    // Materialization barrier: `hourly` feeds BOTH the span/grid side
    // and the fill join — without it Catalyst plans two independent
    // corpus scans + window passes (plan-verified); the checkpoint
    // computes it once and both branches read the persisted RDD.
    val hourly = e.withColumn("rn", row_number().over(byHour))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("hour_bucket"), col("value"))
      .localCheckpoint(false)
    val spans = hourly.groupBy("user_id")
      .agg(min(col("hour_bucket")).as("h0"), max(col("hour_bucket")).as("h1"))
    val grid = spans.select(col("user_id"),
      explode(sequence(col("h0"), col("h1"))).as("hour_bucket"))
    val fill = Window.partitionBy(col("user_id"))
      .orderBy(col("hour_bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(hourly, Seq("user_id", "hour_bucket"), "left")
      .withColumn("filled", col("value").isNull)
      .withColumn("value", last(col("value"), ignoreNulls = true).over(fill))
      .select("user_id", "hour_bucket", "value", "filled")
      .orderBy("user_id", "hour_bucket")
  }

  val qResampleSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_ns(ts) AS ts_ns,
       |    epoch_ns(ts) // $ResampleStepNs AS hour_bucket, value
       |  FROM events),
       |hourly AS (
       |  SELECT user_id, hour_bucket, value FROM (
       |    SELECT user_id, hour_bucket, value,
       |      row_number() OVER (PARTITION BY user_id, hour_bucket
       |        ORDER BY ts_ns DESC, event_id DESC) AS rn
       |    FROM e) t
       |  WHERE rn = 1),
       |spans AS (
       |  SELECT user_id, min(hour_bucket) AS h0, max(hour_bucket) AS h1
       |  FROM hourly GROUP BY user_id),
       |grid AS (
       |  SELECT user_id, unnest(range(h0, h1 + 1)) AS hour_bucket FROM spans),
       |joined AS (
       |  SELECT g.user_id, g.hour_bucket, h.value,
       |    (h.value IS NULL) AS filled
       |  FROM grid g LEFT JOIN hourly h
       |    ON g.user_id = h.user_id AND g.hour_bucket = h.hour_bucket)
       |SELECT user_id, hour_bucket,
       |  (SELECT h2.value FROM hourly h2
       |   WHERE h2.user_id = j.user_id AND h2.hour_bucket <= j.hour_bucket
       |     AND h2.value IS NOT NULL
       |   ORDER BY h2.hour_bucket DESC LIMIT 1) AS value,
       |  filled
       |FROM joined j
       |ORDER BY user_id, hour_bucket""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sessionize" -> qSessionize,
    "q_asof_join" -> qAsofJoin,
    "q_funnel" -> qFunnel,
    "q_range_join" -> qRangeJoin,
    "q_json_extract" -> qJsonExtract,
    "q_retention" -> qRetention,
    "q_resample" -> qResample,
  )

  def oracles: Map[String, String] = Map(
    "q_sessionize" -> qSessionizeSql,
    "q_asof_join" -> qAsofJoinSql,
    "q_funnel" -> qFunnelSql,
    "q_range_join" -> qRangeJoinSql,
    "q_json_extract" -> qJsonExtractSql,
    "q_retention" -> qRetentionSql,
    "q_resample" -> qResampleSql,
  )
}
