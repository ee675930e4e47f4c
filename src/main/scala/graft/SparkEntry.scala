package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.multimodal.Multimodal
import graft.operators.{Analytics, Classify, Curation, Dedup, Embeddings, Events, Graph, Pii, Profiling, Retrieval, ShortcutOps, Similarity, StorageOps, TextAnalysis, Tokenizer, WebCuration}
import graft.streaming.{DocStream, EventStream, StoreStream, VectorStream}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Analytics.queries ++ ShortcutOps.queries ++ TextAnalysis.queries ++
      Dedup.queries ++ Similarity.queries ++ Events.queries ++
      EventStream.queries ++ Multimodal.queries ++ StorageOps.queries ++
      Curation.queries ++ Embeddings.queries ++ WebCuration.queries ++
      Pii.queries ++ Retrieval.queries ++ Profiling.queries ++
      Tokenizer.queries ++ Graph.queries ++ Classify.queries ++
      DocStream.queries ++ StoreStream.queries ++ VectorStream.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    Analytics.oracles ++ ShortcutOps.oracles ++ TextAnalysis.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ Events.oracles ++
      EventStream.oracles ++ Multimodal.oracles ++ StorageOps.oracles ++
      Curation.oracles ++ Embeddings.oracles ++ WebCuration.oracles ++
      Pii.oracles ++ Retrieval.oracles ++ Profiling.oracles ++
      Tokenizer.oracles ++ Graph.oracles ++ Classify.oracles ++
      DocStream.oracles ++ StoreStream.oracles ++ VectorStream.oracles
}
