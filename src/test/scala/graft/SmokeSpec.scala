package graft

import graft.core.Tables

class SmokeSpec extends SparkSpec {
  test("all driver tables load") {
    val t = Tables(spark, sf)
    Tables.names.foreach { n =>
      val c = t.table(n).count()
      assert(c > 0, s"table $n is empty")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has either an oracle or is known rows-only") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracle keys without query: ${os -- qs}")
  }

  test("all registered queries run and return rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"query $name returned 0 rows")
    }
  }

  test("approx distinct stays within the configured HLL error of exact") {
    import org.apache.spark.sql.functions._
    // the one rows-only analytics row gets its bound enforced here:
    // rsd 0.02 → allow 3 sigma ≈ 6%
    val li = Tables(spark, sf).lineitem
    val exact = li.agg(
      countDistinct(col("l_orderkey")), countDistinct(col("l_partkey"))).head()
    val approx = graft.operators.Analytics.qApproxDistinct(spark, sf).head()
    Seq(0, 1).foreach { i =>
      val (e, a) = (exact.getLong(i).toDouble, approx.getLong(i).toDouble)
      assert(math.abs(a - e) / e <= 0.06,
        s"HLL estimate $a vs exact $e exceeds 6% (col $i)")
    }
  }

  test("approx quantiles stay within the sketch's rank-error window of exact") {
    import org.apache.spark.sql.functions._
    // approx_percentile returns an actual data element whose rank is
    // within rows/accuracy of the exact rank — enforce precisely that
    // window per group (the second rows-only analytics row's bound).
    val acc = graft.operators.Analytics.QuantileAccuracy
    val approx = graft.operators.Analytics.qApproxQuantiles(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val groups = Tables(spark, sf).lineitem
      .groupBy(col("l_returnflag"))
      .agg(sort_array(collect_list(col("l_extendedprice"))).as("vs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(approx.keySet == groups.keySet)
    for ((flag, (med, p90)) <- approx; (p, v) <- Seq(0.5 -> med, 0.9 -> p90)) {
      val vs = groups(flag)
      val slack = (vs.size.toDouble / acc).ceil.toInt.max(1)
      val target = (p * vs.size).toInt
      val (lo, hi) = (vs((target - slack).max(0)),
        vs((target + slack).min(vs.size - 1)))
      assert(v >= lo && v <= hi,
        s"$flag p$p: approx $v outside rank window [$lo, $hi] (±$slack ranks)")
    }
  }
}
