package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish tables (see TESTDATA.md).
  *
  * One parquet file per table under `dir` (an sf directory such as
  * `/root/testdata/sf0.01`). Loading is plain `spark.read.parquet`, so
  * column pruning and predicate pushdown reach the scan untouched.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame =
    if (name == "events") events
    else spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame    = table("region")
  def nation: DataFrame    = table("nation")
  def customer: DataFrame  = table("customer")
  def supplier: DataFrame  = table("supplier")
  def part: DataFrame      = table("part")
  def orders: DataFrame    = table("orders")
  def lineitem: DataFrame  = table("lineitem")
  /** The events table carries TIMESTAMP(NANOS) parquet, which Spark's
    * TimestampType (micros) cannot represent. We read the raw int64
    * nanos (`ts_ns`, exact — DuckDB reproduces it via epoch_ns(ts))
    * and derive a micro-truncated TimestampType `ts` for
    * window/streaming use. Oracle-compared queries should do time
    * arithmetic on `ts_ns`.
    */
  def events: DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros((col("ts_ns") / 1000L).cast("long")))
  }
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** All table names, for smoke tests. */
  def names: Seq[String] = Tables.names
}

object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Spread a scan across the session's shuffle width when its natural
    * parallelism falls short — a small single-file table otherwise runs
    * a compute-heavy per-row pipeline in ONE task. The repartition is
    * CONDITIONAL: at real scale the parquet file-split count already
    * provides the parallelism and this is a no-op (no shuffle); only a
    * layout-starved input (one file, few row groups) pays the one
    * round-robin exchange. */
  def spread(df: DataFrame): DataFrame = {
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (df.rdd.getNumPartitions >= parts) df else df.repartition(parts)
  }
}
