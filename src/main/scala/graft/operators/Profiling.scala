package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Column profiling over the fact table — the ANALYZE-style statistics
  * pass every engine runs to feed cost-based optimization (NDV for
  * join-order/selectivity estimates, min/max for zone-map pruning,
  * null counts for outer-join sizing) and every training-data pipeline
  * runs as a pre-flight data-quality audit. The reference's
  * `estimate()` (idx.rs:62-67, 120-127) is the single-column seed of
  * the same idea: index selection needs cardinality estimates, and
  * this operator is where they come from.
  *
  * Shape: ONE unpivot (a narrow `stack` projection — no shuffle, k×
  * row fan-out for k profiled columns) feeds ONE grouped aggregation
  * keyed by column name. count/null-count/min/max are plain
  * map-side-combined aggregates; the exact NDV is a distinct
  * aggregate, which Spark plans as a partial dedup on
  * (col_name, value) before the final count — both exchanges hash on
  * keys whose cardinality scales with the data, so no single-reducer
  * choke. At 100 TB the exact NDV is the one expensive term; the
  * production swap — `graft.profile.ndv=approx`, a mergeable HLL
  * sketch, single pass, no dedup exchange — is a conf switch. The
  * DEFAULT stays exact because the gate hash-compares values and HLL
  * implementations differ per engine (the [[Analytics]]
  * q_approx_distinct precedent: sketches are rows-only by design; an
  * exact profile stays hash-green).
  *
  * No float parity risk by construction: every statistic is a count or
  * an order statistic (min/max select existing values, they never
  * accumulate), so the output is integer-or-exact and needs no
  * rounding step.
  */
object Profiling {

  /** Profiled lineitem columns: the three join keys plus the four
    * numeric measures. Ints cast to double so the unpivoted value
    * column is one type — exact (these magnitudes are far below
    * 2^53). */
  val ProfileCols: Seq[String] = Seq(
    "l_orderkey", "l_partkey", "l_suppkey",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** q_profile — per-column (rows, nulls, NDV, min, max) over
    * lineitem. Output: (col_name, n_rows, n_null, ndv, min_val,
    * max_val), one row per profiled column.
    *
    * `graft.profile.ndv=approx` swaps the exact distinct aggregate for
    * `approx_count_distinct` (mergeable HLL, rsd 5%) — the 100 TB
    * path: a single pass with NO (col_name, value) dedup exchange, the
    * one expensive term gone. Default stays exact so the hash gate
    * keeps comparing true values (HLL estimates differ per engine —
    * the q_approx_distinct precedent); ProfilingSpec pins the approx
    * plan shape (no Expand-side dedup) and its relative error. */
  def qProfile(spark: SparkSession, dir: String): DataFrame = {
    val ndv = graft.core.Confs.enumConf(spark, "graft.profile.ndv",
        "exact", "approx") match {
      case "approx" => approx_count_distinct(col("v"), 0.05)
      case _ => countDistinct(col("v"))
    }
    val li = Tables(spark, dir).lineitem
    val stackArgs = ProfileCols
      .map(c => s"'$c', cast($c as double)").mkString(", ")
    li.select(expr(
        s"stack(${ProfileCols.length}, $stackArgs) as (col_name, v)"))
      .groupBy("col_name")
      .agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("v"))).as("n_null"),
        ndv.as("ndv"),
        min(col("v")).as("min_val"),
        max(col("v")).as("max_val"))
      .orderBy("col_name")
  }

  /** Oracle: a per-column aggregate UNION ALL — semantically the same
    * unpivot+group, spelled so each branch is trivially auditable
    * (count(*) − count(c) = nulls, count(DISTINCT) ignores nulls in
    * both engines, min/max select — never compute). */
  val qProfileSql: String = ProfileCols.map { c =>
    s"""SELECT '$c' AS col_name, count(*)::BIGINT AS n_rows,
       |  (count(*) - count($c))::BIGINT AS n_null,
       |  count(DISTINCT $c)::BIGINT AS ndv,
       |  min($c)::DOUBLE AS min_val, max($c)::DOUBLE AS max_val
       |FROM lineitem""".stripMargin
  }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile" -> qProfile,
  )

  def oracles: Map[String, String] = Map(
    "q_profile" -> qProfileSql,
  )
}
