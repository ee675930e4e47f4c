package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Optimization-round support tool: materialize a SCALED-UP copy of an
  * sf directory so plan behavior can be measured where the data — not
  * the per-job fixed cost — dominates (the gate SFs are too small to
  * exercise scale behavior: at sf0.1 half the suite runs FASTER at 8
  * cores than 32).
  *
  * documents/embeddings/events are replicated K times with key offsets
  * (doc_id offsets are multiples of 97 so the BM25 seed set scales with
  * the corpus, exactly as its `doc_id % 97` contract intends; each
  * replica's text gets a distinct suffix token so replicas are NEAR
  * duplicates — which is what a dedup workload at scale looks like —
  * rather than exact clones). The TPC-H tables are copied unchanged.
  * This produces a measurement INPUT, not a benchmark record: results
  * on it have no oracle and are only used for plan/scaling evidence
  * (side-record committed with the round notes).
  *
  * Usage: runMain graft.ScaleUp <srcSfDir> <dstDir> <K>
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <srcSfDir> <dstDir> <K>")
    val Array(src, dst, kStr) = args
    val k = kStr.toInt
    require(k >= 1, s"K must be >= 1, got $k")
    val spark = graft.core.Sessions.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dst))

    // documents: doc_id offset ≡ 0 (mod 97) preserves the seed contract
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docOffset = 9700000L
    (0 until k).map { i =>
      docs.select(
        (col("doc_id") + lit(i * docOffset)).as("doc_id"),
        (if (i == 0) col("text")
         else concat(col("text"), lit(s" r$i"))).as("text"),
        col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast(
          docs.schema("n_chars").dataType))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val vecOffset = 1000000L
    (0 until k).map { i =>
      emb.select((col("vec_id") + lit(i * vecOffset)).as("vec_id"),
        col("label"), col("embedding"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    val ev = spark.read.parquet(s"$src/events.parquet")
    val evOffset = 100000000L
    (0 until k).map { i =>
      ev.withColumn("event_id", col("event_id") + lit(i * evOffset))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/events.parquet")

    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach { t =>
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      }
    println(s"[scaleup] $src -> $dst at K=$k done")
    spark.stop()
  }
}
