package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round support tool: dump `.explain("formatted")` for
  * named registered queries to files (the judge-checkable
  * `plans/r10/<query>_{before,after}.txt` artifacts), optionally timing
  * one noop-sink execution per query.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <q1,q2,...>
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32),
  *      SPARK_GRAFT_CONF (same contract as Bench).
  *
  * The session is configured identically to [[Bench]] so the captured
  * plan is the plan the bench executes. Explain happens BEFORE the
  * timed run (AQE prints `isFinalPlan=false` — the shape assertions
  * read Exchange counts, join strategies and PushedFilters, which are
  * all visible pre-execution).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanDump <outDir> <suffix> <q1,q2,...>")
    val Array(outDir, suffix, qlist) = args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Sessions.applyEnvConf(spark)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val names = qlist.split(",").map(_.trim).filter(_.nonEmpty)
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[plandump] $name%-24s ${sec}%8.2f s  -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
