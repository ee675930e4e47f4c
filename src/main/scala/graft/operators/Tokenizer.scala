package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.words
import graft.functions.Parity.stableRound

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

  /** Greedy left-to-right fuse of adjacent (l, r) → m over a token
    * array — the standard BPE merge application, as a codegen'd fold:
    * when the accumulated tail is `l` and the next token is `r`,
    * replace the tail with the fused token (a fused token never
    * re-merges within the same pass — the fold's tail check naturally
    * prevents it, matching reference BPE). Shared by training (one
    * pass per learned rank) and encoding (the rank-order replay). */
  def fuseExpr(toks: Column, l: String, r: String, m: String): Column =
    // single-pass codegen'd form of the historical fold
    //   aggregate(toks, array(), (acc, t) => when(size(acc) > 0 &&
    //     element_at(acc, -1) === l && t === r, replace-tail-with-m)
    //     .otherwise(append t))
    // — the fold's concat(slice(...)) rebuilt the accumulator array at
    // every token (O(len²) copies per word per merge) in interpreted
    // lambda calls; FuseBpeAll runs the identical greedy fuse in one
    // buffer pass (ExprSpec pins ≡; TokenizerSpec re-pins the tables)
    graft.functions.expr.BpeExpressions.fuse(toks, l, r, m)

  /** Adjacent-pair counts of a (toks, count) vocabulary frame:
    * (l, r, n) weighted by word count. */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab.filter(size(col("toks")) >= 2)
      .select(col("count"), explode(
        graft.functions.expr.BpeExpressions.adjacentPairs(col("toks"))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("count")).as("n"))

  /** True iff the token sequence contains adjacent (l, r). */
  private def hasPair(toks: Column, l: String, r: String): Column =
    graft.functions.expr.BpeExpressions.hasAdjacentPair(toks, l, r)

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
      val pairs = pairCounts(vocab)
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
        vocab = vocab.select(fuseExpr(col("toks"), l, r, m).as("toks"),
            col("count"))
          .localCheckpoint(false)
        rank += 1L
      }
    }
    spark.createDataset(merges.result())
      .toDF("rank", "left", "right", "merged", "pair_count")
      .orderBy("rank")
  }

  /** The production-scale refinement of [[bpeTrainFromCounts]]: keep
    * the PAIR-COUNT table as maintained state instead of recounting
    * the whole vocabulary every round. After merging (l, r) → m, only
    * words CONTAINING adjacent (l, r) can change any pair's count, so
    * each round (a) filters the vocabulary to that shrinking slice,
    * (b) counts its pairs before and after the fuse, and (c) applies
    * the signed delta to the pair table (one keyed aggregation over
    * vocabulary-bounded rows). The argmax then reads the maintained
    * table directly. Spec-pinned BIT-IDENTICAL to the full recompute
    * (IncrBpeSpec, merge-by-merge, counts included) — same artifact,
    * incremental maintenance path, the d_cluster_incr discipline. At
    * production merge counts (30k+) each round touches only the words
    * containing the increasingly-rare winning pair, while the full
    * recompute stays O(vocabulary) per round — that asymptotic gap is
    * the point; IncrBpeSpec measures it on a Zipf vocabulary. */
  def bpeTrainIncremental(spark: SparkSession, wc: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    var vocab = wc.select(split(col("word"), "").as("toks"), col("count"))
      .filter(size(col("toks")) > 0)
      .localCheckpoint(false)
    // The per-round vocab is filter(vocab) ∪ rewritten — BOTH branches
    // descend from vocab, so without this bound the union DOUBLES the
    // partition count every round (exponential: measured 112k tasks in
    // one stage by round ~15 on a 1500-word fixture). Narrow coalesce
    // back to the input's layout each round.
    val parts = math.max(vocab.rdd.getNumPartitions, 1)
    var pairs = pairCounts(vocab).localCheckpoint(false)
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    var rank = 0L
    var exhausted = false
    while (rank < k && !exhausted) {
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
        // ONE checkpoint carries both the pre-fuse and post-fuse token
        // sequences of the affected slice (the fuse is evaluated once,
        // in the same projection as the filter): the before/after pair
        // recounts and the vocabulary rebuild all read this frame —
        // previously two separate checkpoints (and their jobs) per
        // round for the same rows.
        val affected = vocab.filter(hasPair(col("toks"), l, r))
          .select(col("toks"),
            fuseExpr(col("toks"), l, r, m).as("fused"), col("count"))
          .localCheckpoint(false)
        val rewritten = affected.select(col("fused").as("toks"), col("count"))
        val delta = pairCounts(rewritten)
          .union(pairCounts(affected.select(col("toks"), col("count")))
            .select(col("l"), col("r"), (-col("n")).as("n")))
        pairs = pairs.union(delta)
          .groupBy("l", "r").agg(sum(col("n")).as("n"))
          .filter(col("n") =!= 0)
          .localCheckpoint(false)
        vocab = vocab.filter(!hasPair(col("toks"), l, r)).union(rewritten)
          .coalesce(parts)
          .localCheckpoint(false)
        rank += 1L
      }
    }
    spark.createDataset(merges.result())
      .toDF("rank", "left", "right", "merged", "pair_count")
      .orderBy("rank")
  }

  /** Encode a (word, count) vocabulary with a learned merge list:
    * REPLAY the merges in rank order — each pass is the identical
    * greedy fuse training ran, so on the training corpus the result
    * is exactly training's final vocabulary state (and the standard
    * BPE encode for unseen words). One chained fold expression over
    * the DISTINCT word table — vocabulary-sized work however large
    * the corpus, the same scale argument as training itself. */
  def encodeWords(vocab: DataFrame, merges: Seq[(String, String, String)]): DataFrame = {
    // ONE expression applies the whole rank-ordered replay (each merge
    // is still a full left-to-right pass, in rank order — identical to
    // the chained per-merge folds it replaces, without 12 nested
    // array-rebuild evaluations per word)
    val toks = graft.functions.expr.BpeExpressions.fuseAll(
      split(col("word"), ""), merges)
    vocab.select(col("word"), col("count"), toks.as("toks"))
      .withColumn("n_toks", size(col("toks")).cast("long"))
  }

  private def wordCounts(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.docsSpread(spark, dir)
      .select(explode(words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("count"))

  /** t_bpe_train — the corpus-level entry: tokenize once, aggregate
    * word frequencies, learn [[BpeMerges]] merges. */
  def tBpeTrain(spark: SparkSession, dir: String): DataFrame =
    bpeTrainFromCounts(spark, wordCounts(spark, dir), BpeMerges)

  /** t_bpe_incr — the same merge table via incremental pair-count
    * maintenance ([[bpeTrainIncremental]]). */
  def tBpeIncr(spark: SparkSession, dir: String): DataFrame =
    bpeTrainIncremental(spark, wordCounts(spark, dir), BpeMerges)

  /** t_bpe_encode — tokenize the corpus with the learned tokenizer:
    * train [[BpeMerges]] merges, encode the distinct-word table once
    * (vocabulary-sized), broadcast it back onto per-doc words, and
    * emit per-document token statistics — the real-tokenizer token
    * accounting packing/budget steps downstream want. The merge list
    * is a bounded driver pull (the IVF-centroid class); per-doc work
    * is one narrow pass + one broadcast join + one keyed sum. */
  def tBpeEncode(spark: SparkSession, dir: String): DataFrame =
    bpePerDoc(spark, dir)
      .select(col("doc_id"), col("n_words"), col("n_tokens"), col("n_chars"),
        stableRound(col("n_chars") / col("n_tokens").cast("double"), 4)
          .as("chars_per_token"))
      .orderBy("doc_id")

  /** The shared per-doc token-accounting frame behind [[tBpeEncode]]
    * and [[tBpeFertility]]: (doc_id, lang, source, n_words, n_tokens,
    * n_chars) with token counts from the learned [[BpeMerges]]-merge
    * tokenizer. lang/source ride the grouping key (functionally
    * dependent on doc_id — no extra shuffle, and the fertility rollup
    * needs NO metadata join). */
  private[operators] def bpePerDoc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wc = wordCounts(spark, dir).localCheckpoint(false)
    val merges = bpeTrainFromCounts(spark, wc, BpeMerges)
      .select("left", "right", "merged")
      .as[(String, String, String)].collect().toSeq
    val encoded = encodeWords(wc, merges)
      .select(col("word"), col("n_toks"),
        length(col("word")).cast("long").as("wlen"))
    val perDocWords = TextAnalysis.docsSpread(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        explode(words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
    perDocWords.join(broadcast(encoded), "word")
      .groupBy("doc_id", "lang", "source")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_toks")).as("n_tokens"),
        sum(col("wlen")).as("n_chars"))
  }

  /** t_bpe_fertility — per-(lang, source) FERTILITY rollup of the
    * learned tokenizer: tokens/word (fertility) and chars/token
    * (compression) with the doc/word/token/char sums behind them —
    * the standard multilingual-tokenizer health report (a language
    * whose fertility runs 2× another's pays 2× the context budget
    * per word; fertility drift across sources flags tokenizer/corpus
    * mismatch before a training run pays for it). The d_datacard
    * per-segment discipline applied to [[tBpeEncode]]'s accounting.
    *
    * Scale shape: lang/source already ride [[bpePerDoc]]'s grouping
    * key (no metadata join at all), so this is ONE segments-sized
    * keyed aggregation of INTEGER sums — order-free and exact; the
    * two ratios are one IEEE divide each, rounded at the output.
    * Rows-only at the gate like the whole tokenizer family (the merge
    * list is iteratively learned — no SQL replay); TokenizerSpec pins
    * the rollup bit-identical to an independent recompute from the
    * per-doc frame. */
  def tBpeFertility(spark: SparkSession, dir: String): DataFrame =
    bpePerDoc(spark, dir)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
      .select(col("lang"), col("source"), col("n_docs"), col("n_words"),
        col("n_tokens"), col("n_chars"),
        stableRound(col("n_tokens") / col("n_words").cast("double"), 6)
          .as("fertility"),
        stableRound(col("n_chars") / col("n_tokens").cast("double"), 6)
          .as("chars_per_token"))
      .orderBy("lang", "source")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_bpe_train" -> tBpeTrain,
    "t_bpe_incr" -> tBpeIncr,
    "t_bpe_encode" -> tBpeEncode,
    "t_bpe_fertility" -> tBpeFertility,
  )

  /** No SQL oracle: the learned merge table is iterative (each
    * round's argmax re-tokenizes the next round's input) and the
    * encode replays it — rows-only at the gate; TokenizerSpec and
    * IncrBpeSpec pin the semantics. */
  def oracles: Map[String, String] = Map.empty
}
