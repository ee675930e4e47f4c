package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Plan-shape regression guards: the scale story depends on filters
  * reaching the parquet scan, projections pruning columns, and
  * dimension tables broadcasting — assert it, don't assume it. */
class PlanQualitySpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.explainString(FormattedMode)

  test("selective filters push into the parquet scan") {
    val p = plan("q6_forecast")
    assert(p.contains("PushedFilters"), "no pushdown section")
    assert(p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("LessThan(l_shipdate"),
      s"ship-date range not pushed:\n${p.take(2000)}")
  }

  test("projection prunes the scan schema") {
    val p = plan("q3_revenue")
    val readSchemas = p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(!readSchemas.contains("l_comment") && !readSchemas.contains("l_shipdate"),
      s"lineitem scan reads more than the query needs:\n$readSchemas")
  }

  test("star-join dims broadcast, never shuffle") {
    val p = plan("q5_region")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast joins in q5")
  }

  test("semi join stays a semi join in the physical plan") {
    val p = plan("q_semi_join")
    assert(p.contains("LeftSemi"), s"semi join lost:\n${p.take(1500)}")
  }
}
