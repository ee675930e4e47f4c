package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.words

/** BPE tokenizer training over the documents corpus — the
  * vocabulary-learning step every LLM data pipeline runs before
  * token counting, packing, or training (Sennrich et al. 2016;
  * the GPT-2/Llama tokenizer families are this loop at 30-100k
  * merges).
  *
  * Distribution shape — the part that matters at 100 TB: BPE trains
  * on the WORD-FREQUENCY table, not the corpus. One corpus
  * tokenization pass aggregates to (word, count) — vocabulary-sized,
  * millions of rows where the corpus is billions — and every merge
  * round after that is a small keyed aggregation over that table:
  * explode each word's current token sequence into adjacent pairs
  * weighted by the word count, sum per pair, take the argmax (ONE row
  * to the driver per round — bounded, like the IVF centroid pulls),
  * and rewrite the token sequences with the winning pair fused. Round
  * state is localCheckpointed (the d_cluster lineage discipline), so
  * K rounds stay K short jobs rather than one K-deep plan. Production
  * merge counts (30k+) use the standard incremental refinement — only
  * words CONTAINING the merged pair can change pair counts, so rounds
  * after the first touch a shrinking slice — and train on a bounded
  * corpus sample (the PQ/Gram train-on-sample discipline); both
  * change constants, not this shape.
  *
  * Determinism: ties on pair count break (count desc, left asc,
  * right asc); the merge application is the standard greedy
  * left-to-right fuse, expressed as a codegen'd `aggregate` fold —
  * re-runs are bit-identical. No SQL oracle exists for an
  * iteratively-learned artifact (each round's argmax feeds the next
  * round's tokenization), so the gate records rows-only and
  * TokenizerSpec carries correctness: the merge sequence equals an
  * independent driver-side reference BPE on a classic fixture, and
  * the corpus run is deterministic with exact (left+right = merged)
  * structure.
  */
object Tokenizer {

  /** Merge rounds learned. Real tokenizers run 30k+; the loop is the
    * same, per-round cost is vocabulary-bounded. */
  val BpeMerges = 12

  /** Learn [[BpeMerges]] merges from a (word, count) frequency table.
    * `wc` must carry columns (word: string, count: long). Returns the
    * merge table (rank, left, right, merged, pair_count). */
  def bpeTrainFromCounts(spark: SparkSession, wc: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    // initial state: each word as its character token sequence
    // LAZY checkpoints: every round's next action (the pair-count
    // aggregation + argmax) computes all partitions anyway, so the
    // lazy form persists identically while skipping the extra eager
    // materialization job per round (the [[Dedup.dDedupNgram]]
    // df-rank propagate-round rationale).
    var vocab = wc.select(split(col("word"), "").as("toks"), col("count"))
      .filter(size(col("toks")) > 0)
      .localCheckpoint(false)
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    var rank = 0L
    var exhausted = false
    while (rank < k && !exhausted) {
      val pairs = vocab.filter(size(col("toks")) >= 2)
        .select(col("count"), explode(
          zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("count")).as("n"))
      val top = pairs
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val l: String = top(0).getString(0)
        val r: String = top(0).getString(1)
        val n: Long = top(0).getLong(2)
        val m = l + r
        merges += ((rank, l, r, m, n))
        // greedy left-to-right fuse: fold the sequence; when the
        // accumulated tail is `l` and the next token is `r`, replace
        // the tail with the fused token (a fused token never
        // re-merges within the same round — the fold's tail check
        // naturally prevents it, matching reference BPE)
        vocab = vocab.select(
          aggregate(col("toks"), array().cast("array<string>"),
            (acc, t) => when(
              size(acc) > 0 && element_at(acc, -1) === lit(l) && t === lit(r),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
              .otherwise(concat(acc, array(t)))).as("toks"),
          col("count"))
          .localCheckpoint(false)
        rank += 1L
      }
    }
    spark.createDataset(merges.result())
      .toDF("rank", "left", "right", "merged", "pair_count")
      .orderBy("rank")
  }

  /** t_bpe_train — the corpus-level entry: tokenize once, aggregate
    * word frequencies, learn [[BpeMerges]] merges. */
  def tBpeTrain(spark: SparkSession, dir: String): DataFrame = {
    val wc = TextAnalysis.docsSpread(spark, dir)
      .select(explode(words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("count"))
    bpeTrainFromCounts(spark, wc, BpeMerges)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_bpe_train" -> tBpeTrain,
  )

  /** No SQL oracle: the learned merge table is iterative (each
    * round's argmax re-tokenizes the next round's input) — rows-only
    * at the gate; TokenizerSpec pins the semantics. */
  def oracles: Map[String, String] = Map.empty
}
