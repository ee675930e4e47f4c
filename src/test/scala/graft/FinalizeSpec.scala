package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.streaming.EventStream

/** The `graft.streaming.finalize=eventtime` mode: watermark +
  * event-time-timeout finalization for the stateful streaming
  * operators. Default emit-on-break mode stays under the batch oracle
  * (the gate); these specs pin what the default cannot express —
  * trailing-state emission once the watermark passes, and the
  * finalizing funnel's exactness under out-of-order arrival. */
class FinalizeSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

  /** Epoch base (seconds): keeps every fixture timestamp well above
    * the initial zero watermark so nothing is late-dropped at start.
    * Divisible by 3600 so anomaly hour buckets stay whole. */
  private val Base = 1000L * 3600L

  /** (user/key, event_type, offset-seconds) rows → the watermarked
    * frame the pipelines expect (`ts` event time, `ts_ns` long). */
  private def watermarked(mem: MemoryStream[(Long, String, Long)],
      delay: String): DataFrame =
    mem.toDF().toDF("user_id", "event_type", "sec")
      .withColumn("sec", col("sec") + lit(Base))
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withColumn("ts_ns", col("sec") * lit(1000000000L))
      .withWatermark("ts", delay)

  private def startSink(df: DataFrame, name: String): StreamingQuery =
    df.writeStream.format("memory").queryName(name).outputMode("append").start()

  /** The timeout batch runs AFTER the data batch that advanced the
    * watermark, and processAllAvailable only promises the data is
    * consumed — poll for the expected row count with a deadline. */
  private def awaitRows(q: StreamingQuery, table: String, atLeast: Long): Unit = {
    val deadline = System.currentTimeMillis() + 30000L
    q.processAllAvailable()
    while (spark.table(table).count() < atLeast &&
        System.currentTimeMillis() < deadline) {
      q.processAllAvailable()
      Thread.sleep(50L)
    }
  }

  private def us(sec: Long): Long = (Base + sec) * 1000000L

  test("finalize: sessionizer emits the trailing session once the watermark passes") {
    val mem = MemoryStream[(Long, String, Long)]
    val ds = watermarked(mem, "0 seconds")
      .select(col("user_id"), col("ts_ns"), col("ts")).as[EventStream.Ev]
    val name = "fin_sessionize"
    val q = startSink(EventStream.sessionPipeline(ds, finalize = true).toDF(), name)
    try {
      // one 2-event session (0s, 60s), then a lone event 10000s later
      mem.addData((1L, "view", 0L), (1L, "view", 60L), (1L, "view", 10000L))
      q.processAllAvailable()
      // emit-on-break already closed the first session; the trailing
      // one waits on its gap horizon (10000s + 30min > watermark)
      val afterBatch1 = spark.table(name)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(afterBatch1 == Set((1L, us(0), us(60), 2L)), s"got $afterBatch1")
      // a sentinel user far in the future drives the watermark past it
      mem.addData((99L, "view", 100000L))
      awaitRows(q, name, 2L)
      val all = spark.table(name).as[(Long, Long, Long, Long)].collect().toSet
      assert(all == Set(
        (1L, us(0), us(60), 2L),
        (1L, us(10000), us(10000), 1L)), s"got $all")
      // the sentinel's own trailing session stays open (watermark
      // never passed ITS horizon) — exactly the streaming contract
    } finally q.stop()
  }

  test("finalize: a post-timeout event opens a fresh session (state was removed)") {
    val mem = MemoryStream[(Long, String, Long)]
    val ds = watermarked(mem, "0 seconds")
      .select(col("user_id"), col("ts_ns"), col("ts")).as[EventStream.Ev]
    val name = "fin_sessionize_reopen"
    val q = startSink(EventStream.sessionPipeline(ds, finalize = true).toDF(), name)
    try {
      mem.addData((1L, "view", 0L))
      q.processAllAvailable()
      mem.addData((99L, "view", 50000L)) // finalize user 1's session
      awaitRows(q, name, 1L)
      // user 1 returns later — must be a NEW session, not a resurrection
      mem.addData((1L, "view", 60000L))
      q.processAllAvailable()
      mem.addData((99L, "view", 200000L)) // finalize the new session too
      // (this also finalizes sentinel 99's own 50000s session — the
      // second sentinel event put the watermark past its horizon)
      awaitRows(q, name, 3L)
      val user1 = spark.table(name).as[(Long, Long, Long, Long)].collect()
        .toSet.filter(_._1 == 1L)
      assert(user1 == Set(
        (1L, us(0), us(0), 1L),
        (1L, us(60000), us(60000), 1L)), s"got $user1")
    } finally q.stop()
  }

  test("finalize: anomaly scores the trailing open bucket at its boundary") {
    val mem = MemoryStream[(Long, String, Long)]
    val ds = watermarked(mem, "0 seconds")
      .select(col("event_type"), col("ts_ns"), col("ts")).as[EventStream.AEv]
    val name = "fin_anomaly"
    val q = startSink(EventStream.anomalyPipeline(ds, finalize = true).toDF(), name)
    try {
      // one event in each of 5 consecutive hour buckets: default mode
      // scores bucket 3 (baseline n=3) when bucket 4's event arrives
      // and leaves bucket 4 open forever
      mem.addData((0L until 5L).map(h => (0L, "a", h * 3600L)): _*)
      q.processAllAvailable()
      val afterBatch1 = spark.table(name)
        .select("event_type", "hour_bucket", "n_prior").as[(String, Long, Long)]
        .collect().toSet
      assert(afterBatch1 == Set(("a", Base / 3600L + 3L, 3L)), s"got $afterBatch1")
      // drive the watermark past bucket 4's boundary — it must close
      // WITHOUT a successor event for type "a"
      mem.addData((0L, "b", 100000L))
      awaitRows(q, name, 2L)
      val all = spark.table(name)
        .select("event_type", "hour_bucket", "n_events", "n_prior", "is_anomaly")
        .as[(String, Long, Long, Long, Boolean)].collect().toSet
      assert(all == Set(
        ("a", Base / 3600L + 3L, 1L, 3L, false),
        ("a", Base / 3600L + 4L, 1L, 4L, false)), s"got $all")
    } finally q.stop()
  }

  test("finalize: funnel is exact under out-of-order arrival; default mode is not") {
    // click(200s) and purchase(300s) arrive a batch BEFORE the
    // view(100s) that starts the chain — the real-world replay/late
    // feed shape. A 1-hour watermark delay keeps the view non-late.
    def feed(mem: MemoryStream[(Long, String, Long)],
        pipeline: org.apache.spark.sql.Dataset[EventStream.FEv] =>
          org.apache.spark.sql.Dataset[EventStream.FunnelOut],
        name: String): Set[(Long, Long, Long, Long)] = {
      val ds = watermarked(mem, "1 hour")
        .select(col("user_id"), col("event_type"), col("ts_ns"), col("ts"))
        .as[EventStream.FEv]
      val q = startSink(pipeline(ds).toDF(), name)
      try {
        mem.addData((1L, "click", 200L), (1L, "purchase", 300L))
        q.processAllAvailable()
        mem.addData((1L, "view", 100L))
        q.processAllAvailable()
        mem.addData((99L, "view", 100000L)) // watermark push
        awaitRows(q, name, if (name.contains("final")) 1L else 0L)
        spark.table(name).as[(Long, Long, Long, Long)].collect().toSet
      } finally q.stop()
    }

    val got = feed(MemoryStream[(Long, String, Long)],
      EventStream.funnelFinalPipeline, "fin_funnel_final")
    assert(got == Set((1L, us(100), us(200), us(300))), s"got $got")

    val gotDefault = feed(MemoryStream[(Long, String, Long)],
      EventStream.funnelPipeline, "fin_funnel_default")
    assert(gotDefault.isEmpty,
      s"default mode unexpectedly recovered the out-of-order chain: $gotDefault")
  }

  test("finalize: funnel emits exactly one conversion per user") {
    val mem = MemoryStream[(Long, String, Long)]
    val ds = watermarked(mem, "0 seconds")
      .select(col("user_id"), col("event_type"), col("ts_ns"), col("ts"))
      .as[EventStream.FEv]
    val name = "fin_funnel_once"
    val q = startSink(EventStream.funnelFinalPipeline(ds).toDF(), name)
    try {
      mem.addData((1L, "view", 0L), (1L, "click", 10L), (1L, "purchase", 20L))
      q.processAllAvailable()
      mem.addData((99L, "view", 50000L))
      awaitRows(q, name, 1L)
      // a second full chain for the same user must NOT re-emit
      mem.addData((1L, "view", 60000L), (1L, "click", 60010L),
        (1L, "purchase", 60020L))
      q.processAllAvailable()
      mem.addData((99L, "view", 200000L))
      q.processAllAvailable()
      Thread.sleep(200L)
      q.processAllAvailable()
      val all = spark.table(name).as[(Long, Long, Long, Long)].collect().toSet
      assert(all == Set((1L, us(0), us(10), us(20))), s"got $all")
    } finally q.stop()
  }

  test("finalize: st_sessionize through the conf is the batch sessionization " +
      "plus finalized trailing sessions") {
    val key = "graft.streaming.finalize"
    spark.conf.set(key, "eventtime")
    try {
      val got = EventStream.stSessionize(spark, sf)
        .as[(Long, Long, Long, Long)].collect().toSet
      val deflt = spark.conf.unset(key) match { case _ =>
        EventStream.stSessionize(spark, sf).as[(Long, Long, Long, Long)].collect().toSet
      }
      // the conf run must contain every emit-on-break session ...
      assert(deflt.subsetOf(got),
        s"finalized run lost break-mode sessions: ${deflt -- got}")
      // ... plus ONLY trailing sessions (one per finalized user, each
      // starting at or after that user's last break-mode session)
      val extra = got -- deflt
      assert(extra.nonEmpty, "no trailing session finalized at all")
      val lastBreak = deflt.groupBy(_._1).map { case (u, ss) => u -> ss.map(_._3).max }
      extra.foreach { case (u, start, _, _) =>
        lastBreak.get(u).foreach(lastEnd => assert(start > lastEnd,
          s"finalized session for user $u overlaps break-mode output"))
      }
      assert(extra.groupBy(_._1).forall(_._2.size == 1),
        "a user finalized more than one trailing session")
    } finally spark.conf.unset(key)
  }
}
