package graft.operators
package tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Dev-only stage profiler for operator tuning (test scope — not part
  * of the shipped library). Run:
  *   sbt "Test/runMain graft.operators.tools.Prof <sfDir> <what>"
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm the scan
    t("warm-scan")(graft.core.Tables(spark, dir).documents.count())
    t("full tBm25 (1st)")(graft.operators.Retrieval.tBm25(spark, dir)
      .write.format("noop").mode("overwrite").save())
    t("full tBm25 (2nd)")(graft.operators.Retrieval.tBm25(spark, dir)
      .write.format("noop").mode("overwrite").save())
    val tf = t("tf build+cache") {
      val f = TextAnalysis.docsSpread(spark, dir)
        .select(col("doc_id"), explode(words(col("text"))).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
        .cache()
      f.count()
      f
    }
    val dfw = tf.groupBy("word").agg(count(lit(1)).as("df"))
    t("dfw")(dfw.count())
    val n = 5000.0
    val qt = TextAnalysis.tfIdfRank(
      tf.filter(col("doc_id") % 97 === 0), dfw, n)
      .filter(col("rk") <= 8).select(col("doc_id").as("qid"), col("word"))
    t("qterms")(qt.count())
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val avgdl = tf.agg((sum("tf") / lit(n)).as("avgdl"))
    val joined = qt.join(tf, "word").filter(col("doc_id") =!= col("qid"))
      .join(dfw, "word").join(dl, "doc_id").crossJoin(broadcast(avgdl))
    t("score join")(joined.count())
    val grouped = joined
      .select(col("qid"), col("doc_id"), lit(1.0).as("term"))
      .groupBy("qid", "doc_id")
      .agg(sort_array(collect_list(col("term"))).as("ts"))
    t("group+collect")(grouped.count())
    val scored = grouped.select(col("qid"), col("doc_id"),
      aggregate(col("ts"), lit(0.0), (a, x) => a + x).as("score"))
    t("fold")(scored.count())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
    val ranked = scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 10)
    t("rank window")(ranked.count())
    t("rank+sort noop")(ranked.orderBy("qid", "rk")
      .write.format("noop").mode("overwrite").save())
    t("full tBm25 (3rd)")(graft.operators.Retrieval.tBm25(spark, dir)
      .write.format("noop").mode("overwrite").save())
    if (args.length > 1 && args(1) == "explain") {
      val qe = graft.operators.Retrieval.tBm25(spark, dir).queryExecution
      println(qe.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Window") || l.contains("AQE") || l.contains("Aggregate"))
        .mkString("\n"))
    }
    spark.stop()
  }
}
