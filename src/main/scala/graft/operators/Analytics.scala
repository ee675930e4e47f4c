package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.Parity.stableRound

/** Analytics query suite — demonstrates the engine end-to-end and is
  * what `Bench` times.
  *
  * Every query is written plan-first: filters and projections appear
  * before joins/aggregations so Catalyst pushes them into the parquet
  * scan; dimension tables are explicitly `broadcast()` (at 100 TB the
  * fact tables shuffle on their join keys, dims never should); results
  * end in a deterministic orderBy mirrored by the DuckDB oracle.
  */
object Analytics {

  private val Sep1998 = "1998-09-01 00:00:00"

  /** TPC-H Q1-style pricing summary: grouped aggregate with map-side
    * partial aggregation. One shuffle on the (tiny) group key. */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.filter(col("l_shipdate") <= lit(Sep1998).cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        stableRound(sum(col("l_quantity")), 2).as("sum_qty"),
        stableRound(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        stableRound(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        stableRound(avg(col("l_quantity")), 2).as("avg_qty"),
        stableRound(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** q_incr_agg — incremental materialized-view maintenance: the
    * historical partition's aggregate partials are materialized ONCE
    * (the view), and each refresh aggregates only the delta slice and
    * merges — algebraic aggregates (sum/count) compose, so the merged
    * view is exactly the full-recompute result without rescanning
    * history. The 100 TB payoff is the whole point: a daily refresh
    * reads one day, not the table; the stored partials are
    * group-key-sized, not data-sized. [[prepare]] pre-builds the
    * materialized history outside Bench's timed window — the view
    * build is the one-time cost, the refresh is what the bench
    * measures.
    *
    * Delta = l_orderkey ≡ 3 (mod 4) stands in for "the new
    * partition"; the history partials write to scratch on first call
    * (the [[StorageOps]] writeOnce discipline) and every call after
    * reads them back, aggregates the delta, and merges with one
    * group-key-sized union+re-agg. Float parity follows [[q1Pricing]]:
    * double sums under stableRound(2), counts exact. */
  def qIncrAgg(spark: SparkSession, dir: String): DataFrame = {
    val path = StorageOps.scratch("incragg", dir)
    val li = Tables(spark, dir).lineitem
    val isDelta = pmod(col("l_orderkey"), lit(4L)) === 3L
    def partials(df: DataFrame): DataFrame =
      df.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")).as("p_qty"),
          sum(col("l_extendedprice")).as("p_price"),
          count(lit(1)).as("p_cnt"))
    StorageOps.buildOnce(path) {
      partials(li.filter(!isDelta)).write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
      .unionByName(partials(li.filter(isDelta)))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(stableRound(sum(col("p_qty")), 2).as("sum_qty"),
        stableRound(sum(col("p_price")), 2).as("sum_base_price"),
        sum(col("p_cnt")).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Pre-build the q_incr_agg materialized history (Bench calls this
    * before timing, next to the store prepares). */
  def prepare(spark: SparkSession, dir: String): Unit =
    qIncrAgg(spark, dir).write.format("noop").mode("overwrite").save()

  val qIncrAggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  floor((sum(l_quantity)) * 1e2 + 0.5) / 1e2 AS sum_qty,
      |  floor((sum(l_extendedprice)) * 1e2 + 0.5) / 1e2 AS sum_base_price,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  floor((sum(l_quantity)) * 1e2 + 0.5) / 1e2 AS sum_qty,
      |  floor((sum(l_extendedprice)) * 1e2 + 0.5) / 1e2 AS sum_base_price,
      |  floor((sum(l_extendedprice * (1.0 - l_discount))) * 1e2 + 0.5) / 1e2 AS sum_disc_price,
      |  floor((avg(l_quantity)) * 1e2 + 0.5) / 1e2 AS avg_qty,
      |  floor((avg(l_discount)) * 1e4 + 0.5) / 1e4 AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style: customer ⨝ orders ⨝ lineitem, revenue per order,
    * top 10. customer is the small side → broadcast; orders/lineitem
    * co-shuffle on orderkey. */
  def q3Revenue(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val cust = t.customer.filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = t.orders.select("o_orderkey", "o_custkey", "o_orderdate")
    val li = t.lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"))
      .agg(stableRound(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3RevenueSql: String =
    """SELECT l_orderkey,
      |  floor((sum(l_extendedprice * (1.0 - l_discount))) * 1e2 + 0.5) / 1e2 AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY l_orderkey
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5-style star join: lineitem ⨝ orders ⨝ customer ⨝ supplier
    * ⨝ nation ⨝ region; revenue per nation. All dims broadcast (they
    * stay small at any SF); only the fact tables shuffle. */
  def q5Region(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val nat = t.nation.join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
    val li = t.lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val ord = t.orders.select("o_orderkey", "o_custkey")
    val sup = t.supplier.select("s_suppkey", "s_nationkey")
    val cust = t.customer.select("c_custkey", "c_nationkey")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(stableRound(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("n_name"))
  }

  val q5RegionSql: String =
    """SELECT n_name,
      |  floor((sum(l_extendedprice * (1.0 - l_discount))) * 1e2 + 0.5) / 1e2 AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** TPC-H Q6-style: highly selective filter + single aggregate. The
    * whole predicate pushes into the parquet scan. */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.filter(col("l_shipdate") >= lit("1994-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1995-01-01 00:00:00").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(stableRound(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  val q6ForecastSql: String =
    """SELECT floor((sum(l_extendedprice * l_discount)) * 1e2 + 0.5) / 1e2 AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** Top-3 orders per customer by total price: one shuffle on the
    * window partition key, rank inside. */
  def qTopkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables(spark, dir).orders
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    ord.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .orderBy(col("o_custkey"), col("rk"))
  }

  val qTopkPerGroupSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) t
      |WHERE rk <= 3
      |ORDER BY o_custkey, rk""".stripMargin

  /** Running revenue per supplier ordered by ship date: rows-frame
    * cumulative sum (deterministic tie-break on orderkey/linenumber). */
  def qRunningWindow(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    li.filter(col("l_suppkey") <= 3)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        stableRound(sum(col("l_quantity")).over(w), 2).as("running_qty"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  val qRunningWindowSql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  floor((sum(l_quantity) OVER (PARTITION BY l_suppkey
      |    ORDER BY l_shipdate, l_orderkey, l_linenumber
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 1e2 + 0.5) / 1e2 AS running_qty
      |FROM lineitem
      |WHERE l_suppkey <= 3
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  /** Hierarchical ROLLUP aggregate over returnflag/linestatus. */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(stableRound(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  val qRollupSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  floor((sum(l_quantity)) * 1e2 + 0.5) / 1e2 AS sum_qty, count(*) AS n_rows
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Exact distinct counts (two-phase distinct aggregation). */
  def qDistinct(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"))
      .orderBy(col("l_returnflag"))
  }

  val qDistinctSql: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_orderkey) AS n_orders,
      |  count(DISTINCT l_partkey) AS n_parts
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** HLL approximate distinct — sketch output is engine-specific, so
    * the driver records a rows-only check (no oracleSql entry). The
    * spec bounds relative error against the exact count instead. */
  def qApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.agg(approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
  }

  /** Skew-resistant salted join: same result as a plain join, but the
    * fact side is salted into 8 sub-keys and the (broadcastable) dim
    * side replicated 8×, so one hot key spreads over 8 reducers.
    * With AQE skew-join this is usually automatic; shown explicitly as
    * the hand-rolled pattern for non-AQE paths. */
  def qSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val salts = 8
    val li = t.lineitem.select("l_orderkey", "l_suppkey", "l_quantity")
      .withColumn("salt", pmod(col("l_orderkey"), lit(salts)).cast("int"))
    val sup = t.supplier.select("s_suppkey", "s_nationkey")
      .crossJoin(spark.range(salts).select(col("id").cast("int").as("salt")))
    li.join(broadcast(sup), Seq("salt")).filter(col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(stableRound(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n_rows"))
      .orderBy(col("s_nationkey"))
  }

  val qSaltedJoinSql: String =
    """SELECT s_nationkey, floor((sum(l_quantity)) * 1e2 + 0.5) / 1e2 AS sum_qty, count(*) AS n_rows
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_nationkey
      |ORDER BY s_nationkey""".stripMargin

  /** Left-semi join (EXISTS): customers that placed a high-value
    * order. Semi joins ship only the probe side through the shuffle —
    * no row multiplication. */
  def qSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val big = t.orders.filter(col("o_totalprice") > 300000.0).select("o_custkey")
    t.customer.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  val qSemiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      |ORDER BY c_custkey""".stripMargin

  /** Left-anti join (NOT EXISTS): customers with no high-value
    * order. */
  def qAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val big = t.orders.filter(col("o_totalprice") > 300000.0).select("o_custkey")
    t.customer.join(big, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")
  }

  val qAntiJoinSql: String =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      |ORDER BY c_custkey""".stripMargin

  /** Set operations: custkeys appearing in BUILDING but not among
    * high-balance customers (EXCEPT), plus the INTERSECT count. */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir).customer
    val building = cust.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val rich = cust.filter(col("c_acctbal") > 5000.0).select("c_custkey")
    building.except(rich)
      .withColumn("op", lit("except"))
      .unionByName(building.intersect(rich).withColumn("op", lit("intersect")))
      .orderBy("op", "c_custkey")
  }

  val qSetOpsSql: String =
    """SELECT * FROM (
      |  SELECT c_custkey, 'except' AS op FROM (
      |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |    EXCEPT
      |    SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0) e
      |  UNION ALL
      |  SELECT c_custkey, 'intersect' AS op FROM (
      |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |    INTERSECT
      |    SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0) i) t
      |ORDER BY op, c_custkey""".stripMargin

  /** Full CUBE over returnflag × linestatus. */
  def qCube(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(stableRound(sum(col("l_extendedprice")), 2).as("sum_price"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  val qCubeSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  floor((sum(l_extendedprice)) * 1e2 + 0.5) / 1e2 AS sum_price, count(*) AS n_rows
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** GROUPING SETS — the general multi-aggregation form rollup/cube
    * specialize: one pass computes the per-flag, per-status, and grand
    * totals (Spark's Expand operator fans each row into its grouping
    * sets before one shuffle — no multi-scan union). grouping_id
    * disambiguates real NULL group keys from subtotal rows. */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.createOrReplaceTempView("g_lineitem")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  floor((sum(l_extendedprice)) * 1e2 + 0.5) / 1e2 AS sum_price, count(*) AS n_rows,
        |  grouping_id(l_returnflag, l_linestatus) AS gid
        |FROM g_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  val qGroupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  floor((sum(l_extendedprice)) * 1e2 + 0.5) / 1e2 AS sum_price, count(*) AS n_rows,
      |  grouping(l_returnflag, l_linestatus)::BIGINT AS gid
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Manual pivot: one column per market segment (engine-portable
    * CASE formulation — semantics of DataFrame.pivot without relying
    * on engine-specific pivot syntax). */
  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val joined = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    val aggCols = segs.map(s =>
      stableRound(sum(when(col("c_mktsegment") === s, col("o_totalprice"))), 2)
        .as(s"sum_${s.toLowerCase}"))
    joined.groupBy(col("o_orderpriority"))
      .agg(aggCols.head, aggCols.tail: _*)
      .orderBy("o_orderpriority")
  }

  val qPivotSql: String = {
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    val cols = segs.map(s =>
      s"floor((sum(CASE WHEN c_mktsegment = '$s' THEN o_totalprice END)) * 1e2 + 0.5) / 1e2 AS sum_${s.toLowerCase}")
    s"""SELECT o_orderpriority, ${cols.mkString(", ")}
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin
  }

  /** Exact interpolated quantiles per group (single-pass sort-based
    * percentile; the approximate sketch path is q_approx_distinct's
    * HLL sibling — at 100 TB you'd reach for approx_percentile, which
    * is sketch-mergeable across partitions). */
  def qQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    // Both price percentiles come from ONE percentile(col, array(...))
    // aggregate: separate calls each build their own per-group value
    // map in the aggregation buffer — same answer, twice the state.
    li.groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, array(0.5D, 0.9D))").as("pp"),
        stableRound(expr("percentile(l_quantity, 0.25)"), 2).as("q1_qty"))
      .select(col("l_returnflag"),
        stableRound(element_at(col("pp"), 1), 2).as("median_price"),
        stableRound(element_at(col("pp"), 2), 2).as("p90_price"),
        col("q1_qty"))
      .orderBy("l_returnflag")
  }

  val qQuantilesSql: String =
    """SELECT l_returnflag,
      |  floor((quantile_cont(l_extendedprice, 0.5)) * 1e2 + 0.5) / 1e2 AS median_price,
      |  floor((quantile_cont(l_extendedprice, 0.9)) * 1e2 + 0.5) / 1e2 AS p90_price,
      |  floor((quantile_cont(l_quantity, 0.25)) * 1e2 + 0.5) / 1e2 AS q1_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Trailing window width for [[qRangeWindow]], in seconds. */
  val TrailingWindowSec = 2592000L // 30 days

  /** Trailing-30-day quantity per supplier line: a RANGE frame over
    * event time — the value-based sliding window a ROWS frame
    * ([[qRunningWindow]]) cannot express (peers at the same second
    * aggregate together; gaps widen or shrink the row span). One hash
    * exchange on the partition key, then a streaming frame over each
    * sorted run. Event time is compared as epoch SECONDS (exact
    * integer arithmetic in both engines); quantities are
    * integer-valued doubles, so the frame sum is exact in any
    * accumulation order — no rounding step needed. */
  def qRangeWindow(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    // NTZ → session-tz timestamp → epoch seconds; the UTC session pin
    // (Verify/Bench/tests all set it) makes this DuckDB's naive epoch().
    val shipS = unix_seconds(col("l_shipdate").cast("timestamp"))
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(shipS)
      .rangeBetween(-TrailingWindowSec, 0)
    li.filter(col("l_suppkey") <= 3)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        shipS.as("ship_s"),
        sum(col("l_quantity")).over(w).as("qty_30d"))
      .orderBy(col("l_suppkey"), col("ship_s"), col("l_orderkey"), col("l_linenumber"))
  }

  val qRangeWindowSql: String =
    s"""SELECT l_suppkey, l_orderkey, l_linenumber,
       |  epoch(l_shipdate)::BIGINT AS ship_s,
       |  sum(l_quantity) OVER (PARTITION BY l_suppkey
       |    ORDER BY epoch(l_shipdate)::BIGINT
       |    RANGE BETWEEN $TrailingWindowSec PRECEDING AND CURRENT ROW) AS qty_30d
       |FROM lineitem
       |WHERE l_suppkey <= 3
       |ORDER BY l_suppkey, ship_s, l_orderkey, l_linenumber""".stripMargin

  /** Histogram bin width over l_extendedprice (dollars). */
  val HistBinWidth = 5000.0

  /** Fixed-width price histogram — the distribution-profiling scan a
    * corpus audit runs before choosing partition bounds or spotting
    * skew. Binning is a narrow map (one floor-divide per row); the
    * aggregation shuffles ≤ ~21 bin rows after map-side partials.
    * Every aggregate here is ORDER-INDEPENDENT — count, min/max, and
    * sums of integer-valued doubles (exact below 2^53) — so the
    * result is engine-exact with no rounding step at all, at any
    * partition count. */
  def qHistogram(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.select(floor(col("l_extendedprice") / lit(HistBinWidth)).as("bin"),
        col("l_quantity"), col("l_extendedprice"))
      .groupBy("bin")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
      .orderBy("bin")
  }

  val qHistogramSql: String =
    s"""SELECT CAST(floor(l_extendedprice / $HistBinWidth) AS BIGINT) AS bin,
       |  count(*) AS cnt,
       |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       |  min(l_extendedprice) AS min_price,
       |  max(l_extendedprice) AS max_price
       |FROM lineitem
       |GROUP BY 1
       |ORDER BY bin""".stripMargin

  /** Pearson correlation of quantity vs discount per return flag,
    * via INTEGER moment sums — the one-pass distributed corr that is
    * actually deterministic. The built-in `corr` accumulates doubles,
    * so its last-ulp result depends on partition merge order: not
    * engine-stable, not even run-to-run stable on a cluster. Here
    * both series are integer-valued (quantity; discount in exact
    * percent points), so the six moments (n, Σx, Σy, Σxy, Σx², Σy²)
    * are exact longs in ANY accumulation order — one map-side-combined
    * exchange on the group key — and the closing formula runs the
    * identical correctly-rounded double ops in both engines. */
  def qCorr(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    def d(c: String) = col(c).cast("double")
    li.select(col("l_returnflag"), col("l_quantity").cast("long").as("x"),
        floor(col("l_discount") * lit(100.0) + lit(0.5)).as("y"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("l_returnflag"), col("n"),
        stableRound((d("n") * d("sxy") - d("sx") * d("sy")) /
          sqrt((d("n") * d("sxx") - d("sx") * d("sx")) *
            (d("n") * d("syy") - d("sy") * d("sy"))), 6).as("corr_qd"))
      .orderBy("l_returnflag")
  }

  val qCorrSql: String =
    """SELECT l_returnflag, n,
      |  floor(((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
      |    sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) *
      |      (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))) * 1e6 + 0.5) / 1e6 AS corr_qd
      |FROM (
      |  SELECT l_returnflag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
      |          CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS y
      |        FROM lineitem) v
      |  GROUP BY l_returnflag) m
      |ORDER BY l_returnflag""".stripMargin

  /** approx_percentile's rank-error accuracy knob: per group the
    * returned element's rank is within rows/accuracy of the exact
    * rank (SmokeSpec enforces exactly that window). */
  val QuantileAccuracy = 10000

  /** Sketch-based per-group quantiles — the scale path [[qQuantiles]]'
    * scaladoc names for 100 TB: approx_percentile's quantile-summary
    * buffer is MERGEABLE across partitions (map-side partial sketches
    * combine like any partial aggregate — no per-group global value
    * map), trading a bounded RANK error (≤ rows/accuracy per group)
    * for bounded state. Rows-only at the driver — a sketch's output
    * is implementation-defined, so there is no SQL-exact oracle; the
    * spec enforces the quantitative rank window against the exact
    * order statistics instead, the same discipline as
    * q_approx_distinct's HLL error bound. */
  def qApproxQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.groupBy(col("l_returnflag"))
      .agg(expr(s"approx_percentile(l_extendedprice, array(0.5D, 0.9D), $QuantileAccuracy)")
        .as("pp"))
      .select(col("l_returnflag"),
        element_at(col("pp"), 1).as("median_price_approx"),
        element_at(col("pp"), 2).as("p90_price_approx"))
      .orderBy("l_returnflag")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> q1Pricing,
    "q_incr_agg" -> qIncrAgg,
    "q_quantiles" -> qQuantiles,
    "q_semi_join" -> qSemiJoin,
    "q_anti_join" -> qAntiJoin,
    "q_setops" -> qSetOps,
    "q_cube" -> qCube,
    "q_grouping_sets" -> qGroupingSets,
    "q_pivot" -> qPivot,
    "q3_revenue" -> q3Revenue,
    "q5_region" -> q5Region,
    "q6_forecast" -> q6Forecast,
    "q_topk_per_group" -> qTopkPerGroup,
    "q_running_window" -> qRunningWindow,
    "q_range_window" -> qRangeWindow,
    "q_histogram" -> qHistogram,
    "q_corr" -> qCorr,
    "q_rollup" -> qRollup,
    "q_distinct" -> qDistinct,
    "q_approx_distinct" -> qApproxDistinct,
    "q_approx_quantiles" -> qApproxQuantiles,
    "q_salted_join" -> qSaltedJoin,
  )

  def oracles: Map[String, String] = Map(
    "q1_pricing" -> q1PricingSql,
    "q_incr_agg" -> qIncrAggSql,
    "q_quantiles" -> qQuantilesSql,
    "q_semi_join" -> qSemiJoinSql,
    "q_anti_join" -> qAntiJoinSql,
    "q_setops" -> qSetOpsSql,
    "q_cube" -> qCubeSql,
    "q_grouping_sets" -> qGroupingSetsSql,
    "q_pivot" -> qPivotSql,
    "q3_revenue" -> q3RevenueSql,
    "q5_region" -> q5RegionSql,
    "q6_forecast" -> q6ForecastSql,
    "q_topk_per_group" -> qTopkPerGroupSql,
    "q_running_window" -> qRunningWindowSql,
    "q_range_window" -> qRangeWindowSql,
    "q_histogram" -> qHistogramSql,
    "q_corr" -> qCorrSql,
    "q_rollup" -> qRollupSql,
    "q_distinct" -> qDistinctSql,
    "q_salted_join" -> qSaltedJoinSql,
  )
}
