package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Optimization-round support tool: run one registered query through
  * the noop sink and print per-stage executor time, task count, and
  * the stage's name/callsite — the empirical loop of guide §1.1
  * without the UI.
  *
  * Usage: runMain graft.StageProfile <q1,q2,...>
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_CONF as Bench.
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: StageProfile <q1,q2,...>")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Sessions.applyEnvConf(spark)
    final case class St(var ms: Long = 0L, var tasks: Int = 0,
      var shufReadMs: Long = 0L, var rows: Long = 0L,
      var deserMs: Long = 0L, var gcMs: Long = 0L, var cpuNs: Long = 0L)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, St]()
    val names = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          val s = stages.computeIfAbsent(t.stageId, _ => St())
          s.synchronized {
            s.ms += m.executorRunTime; s.tasks += 1
            s.shufReadMs += m.shuffleReadMetrics.fetchWaitTime
            s.rows += m.outputMetrics.recordsWritten
            s.deserMs += m.executorDeserializeTime
            s.gcMs += m.jvmGCTime
            s.cpuNs += m.executorCpuTime
          }
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        // the RDD scope names carry the physical operator names of the
        // stage — the UI's DAG labels, good enough to attribute a stage
        val ops = sc.stageInfo.rddInfos.flatMap { r =>
          r.scope.map(_.name)
        }.distinct.mkString(">")
        names.put(sc.stageInfo.stageId, ops.take(220)): Unit
      }
    })
    // Poor-man's sampling profiler: every 50 ms, record the top
    // interesting frame of each "Executor task launch worker" thread,
    // split by thread state (RUNNABLE vs BLOCKED/WAITING) — answers
    // both "where does CPU go" and "what are tasks blocked on".
    val samples = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val all = Thread.getAllStackTraces
        all.forEach { (t, st) =>
          if (t.getName.startsWith("Executor task launch") && st.nonEmpty) {
            val frame = st.take(24)
              .find(f => !f.getClassName.startsWith("java.") &&
                !f.getClassName.startsWith("jdk.") &&
                !f.getClassName.startsWith("scala.") &&
                !f.getClassName.startsWith("sun."))
              .getOrElse(st.head)
            val key = s"${t.getState}: ${frame.getClassName}.${frame.getMethodName}"
            samples.computeIfAbsent(key,
              _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet(): Unit
          }
        }
        Thread.sleep(50)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    args(0).split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
      stages.clear(); names.clear(); samples.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftListenerBridge.flushListeners(spark.sparkContext): Unit
      println(f"== $name: wall $sec%.2f s ==")
      import scala.jdk.CollectionConverters._
      val total = stages.values.asScala.map(_.ms).sum / 1e3
      stages.asScala.toSeq.sortBy(-_._2.ms).take(25).foreach { case (id, s) =>
        println(f"  stage $id%4d  exec ${s.ms / 1e3}%8.2f s  cpu ${s.cpuNs / 1e9}%7.2f s  " +
          f"deser ${s.deserMs / 1e3}%6.2f s  gc ${s.gcMs / 1e3}%5.2f s  tasks ${s.tasks}%4d  " +
          f"${names.getOrDefault(id, "")}")
      }
      println(f"  TOTAL exec $total%.2f s over ${stages.size} stages")
      val top = samples.asScala.toSeq.sortBy(-_._2.get).take(20)
      val totSamp = samples.asScala.map(_._2.get).sum.max(1L)
      println(s"  -- sampled executor frames (${totSamp} samples):")
      top.foreach { case (k, v) =>
        println(f"    ${v.get * 100.0 / totSamp}%5.1f%%  $k")
      }
    }
    sampling = false
    spark.stop()
  }
}
