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
}
