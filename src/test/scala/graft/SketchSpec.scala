package graft

import org.apache.spark.sql.functions._
import graft.functions.expr.SketchAggregates
import graft.operators.TextAnalysis

/** The Misra–Gries aggregate's guarantee, exercised where it matters:
  * a vocabulary far larger than the counter budget. Any word with
  * true count > n/(k+1) must be present in the summary whatever
  * Spark's partitioning/merge order, and the thresholded exact
  * recount (the t_heavy_hitters tail) must equal the full exact
  * computation. */
class SketchSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("MG summary retains every guaranteed heavy hitter on a 50k-word Zipf stream") {
    val rnd = new scala.util.Random(20260816L)
    val vocab = 50000
    val n = 200000
    val zexp = 1.2
    val cum = Array.tabulate(vocab)(r => 1.0 / math.pow(r + 1.0, zexp))
      .scanLeft(0.0)(_ + _).tail
    val toks = Array.fill(n) {
      val x = rnd.nextDouble() * cum.last
      var lo = 0
      var hi = vocab - 1
      while (lo < hi) {
        val mid = (lo + hi) / 2
        if (cum(mid) < x) lo = mid + 1 else hi = mid
      }
      s"w$lo"
    }
    val k = TextAnalysis.HhK
    val df = toks.toSeq.toDF("word").repartition(7) // uneven partitioning on purpose
    val summary = df.agg(SketchAggregates.misraGries(col("word"), k).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.word"), col("e.cnt")).as[(String, Long)].collect()
    assert(summary.length <= k, s"summary exceeded budget: ${summary.length}")
    val exact = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val heavy = exact.filter { case (_, c) => c * (k + 1) > n }
    assert(heavy.nonEmpty, "fixture produced no guaranteed heavy hitters")
    val present = summary.map(_._1).toSet
    val missing = heavy.keySet -- present
    assert(missing.isEmpty, s"guaranteed heavy hitters missing: $missing")
    // reported counts underestimate by at most the decrement mass bound
    summary.foreach { case (w, c) =>
      val t = exact.getOrElse(w, 0L)
      assert(c <= t, s"$w overcounted: $c > $t")
      assert(t - c <= n / (k + 1) + 1, s"$w undercount ${t - c} beyond bound")
    }
    // the operator tail: thresholded exact recount == full exact answer
    val candSet = present
    val recount = exact.filter { case (w, c) => candSet(w) && c * (k + 1) > n }
    assert(recount == heavy, "thresholded recount diverged from exact")
  }

  test("t_heavy_hitters is deterministic and matches a driver-side recompute") {
    val a = TextAnalysis.tHeavyHitters(spark, sf)
      .as[(String, Long, Double)].collect().toSeq
    assert(a.nonEmpty)
    val b = TextAnalysis.tHeavyHitters(spark, sf)
      .as[(String, Long, Double)].collect().toSeq
    assert(a == b, "re-run diverged")
    // exact counts from an independent pass
    val exact = graft.core.Tables(spark, sf).documents
      .select(explode(graft.functions.TextFunctions.words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val heavy = exact.filter { case (_, c) => c * (TextAnalysis.HhK + 1) > n }
    assert(a.map(t => t._1 -> t._2).toMap == heavy)
  }
}
