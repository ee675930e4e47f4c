package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Structured Streaming operators over the `events` table.
  *
  * Each query runs a real streaming pipeline (file source → event-time
  * transform → memory sink, driven to completion with
  * `processAllAvailable`) whose result must equal the equivalent batch
  * query — which is exactly what the DuckDB oracle checks. On a
  * cluster the same plans run against a live source with the
  * watermarks bounding state.
  */
object EventStream {

  private val HourNs = 3600L * 1000000000L

  /** The streaming reader for events: same nanos-as-long handling as
    * the batch loader, plus the derived micro-precision `ts`. */
  private def eventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Raw file schema (ts arrives as int64 nanos under nanosAsLong);
    // rename post-load so the by-name parquet column binding works.
    val raw = spark.read.parquet(s"$dir/events.parquet").schema
    // The file stream source requires a directory; the test data is a
    // single parquet file, so expose it through a temp-dir symlink
    // (a real deployment streams an arriving-files directory anyway).
    val streamDir = java.nio.file.Files.createTempDirectory("graft_events_stream")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    spark.readStream
      .schema(raw)
      .parquet(streamDir.toString)
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros((col("ts_ns") / 1000L).cast("long")))
  }

  private def runToTable(df: DataFrame, mode: String): DataFrame = {
    val name = "graft_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    try {
      q.processAllAvailable()
    } finally {
      q.stop()
    }
    df.sparkSession.table(name)
  }

  /** Streaming windowed aggregation: hourly tumbling windows per
    * event_type with a 1-hour watermark; complete-mode memory sink for
    * a deterministic full answer. Result ≡ the batch hourly rollup. */
  def stWindowAgg(spark: SparkSession, dir: String): DataFrame = {
    val agg = eventStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
    runToTable(agg, "complete")
      .select((unix_timestamp(col("w.start")) / 3600L).cast("long").as("hour_bucket"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("hour_bucket", "event_type")
  }

  val stWindowAggSql: String =
    s"""SELECT epoch_ns(ts) // $HourNs AS hour_bucket, event_type,
       |  count(*) AS n_events, round(sum(value), 2) AS sum_value
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY hour_bucket, event_type""".stripMargin

  /** Streaming dedup: at most one (user, event_type, hour) key,
    * emitted on first arrival — `dropDuplicates` with a watermark
    * bounding the key state. Output is the key set, so the result is
    * deterministic and ≡ batch SELECT DISTINCT. */
  def stStreamDedup(spark: SparkSession, dir: String): DataFrame = {
    val keyed = eventStream(spark, dir)
      .withColumn("hour_bucket", (col("ts_ns") / lit(HourNs)).cast("long"))
      .withWatermark("ts", "1 hour")
      .dropDuplicates("user_id", "event_type", "hour_bucket")
      .select("user_id", "event_type", "hour_bucket")
    runToTable(keyed, "append")
      .orderBy("user_id", "event_type", "hour_bucket")
  }

  val stStreamDedupSql: String =
    s"""SELECT DISTINCT user_id, event_type, epoch_ns(ts) // $HourNs AS hour_bucket
       |FROM events
       |ORDER BY user_id, event_type, hour_bucket""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_window_agg" -> stWindowAgg,
    "st_stream_dedup" -> stStreamDedup,
  )

  def oracles: Map[String, String] = Map(
    "st_window_agg" -> stWindowAggSql,
    "st_stream_dedup" -> stStreamDedupSql,
  )
}
