package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Parity.{stableRound, stableRoundSql}
import graft.functions.TextFunctions._

/** Corpus retrieval scoring over the `documents` table — the lexical
  * ranking half of a data-curation retrieval stack (the other half,
  * embedding ANN, lives in [[Similarity]]). The flagship op is BM25
  * "more-like-this": a fixed set of query documents retrieves its
  * nearest corpus neighbors under the Robertson/Lucene BM25 weight,
  * the standard tool for quality-aware corpus expansion ("find more
  * documents like these curated seeds") and retrieval-based data
  * selection.
  *
  * Distribution: ONE tokenization pass (the cached (doc, word) tf
  * frame) feeds document lengths, document frequencies, query-keyword
  * extraction, and the scoring join — the same shared-scan discipline
  * as [[TextAnalysis.tKeywords]]. The query-term table is tiny by
  * construction (|Q| seed docs × [[Bm25QTerms]] terms), so Catalyst
  * broadcasts it into the postings join and the candidate stream is
  * bounded by Σ df(t) over the query terms — never corpus × corpus,
  * never even corpus × queries. Per-query top-k is a window rank over
  * the (query, doc) aggregate's own exchange. At 100 TB the only
  * corpus-scale shuffles are the two keyed aggregations (tf, then
  * (qid, doc) scores), both map-side combined.
  *
  * Float parity: every BM25 input is an exact integer count; the
  * score chain is spelled with the identical IEEE op sequence in both
  * engines, per-(query, doc) terms fold in sorted order ([[TextAnalysis.tLogprob]]
  * discipline — ln is 1-ulp engine-dependent), and ranking runs on the
  * [[stableRound]]ed score with a doc_id tie-break.
  */
object Retrieval {

  /** BM25 k1 (term-frequency saturation). The numerator's (k1+1) is
    * spelled as the literal 2.2 in both engines so neither computes
    * 1.2 + 1.0 at a possibly-different intermediate precision; the
    * oracle's decimal literals promote to the identical doubles
    * (decimal→double conversion is correctly rounded). */
  val Bm25K1 = 1.2

  /** BM25 b (length normalization); 0.25 below is the exact (1 - b). */
  val Bm25B = 0.75

  /** Every doc_id ≡ 0 (mod this) is a query seed: 6 seeds at 500 docs
    * (sf0.001/sf0.01), 52 at sf0.1 — scales with the corpus while
    * staying broadcastable. */
  val Bm25QueryMod = 97

  /** Query terms kept per seed doc (its top TF-IDF keywords — the
    * [[TextAnalysis.tKeywords]] score, recomputed here off the shared
    * tf frame). */
  val Bm25QTerms = 8

  /** Results per query. */
  val Bm25TopK = 10

  /** t_bm25 — top-k BM25 retrieval for each seed query, excluding the
    * seed itself. Output: (qid, rk, doc_id, score).
    *
    * Stage economy (measured: each broadcast build and exchange is a
    * fixed-cost job at small scale, and they dominated the first cut):
    * the query-term table CARRIES its df out of the keyword ranking so
    * the candidate stream joins dfw zero extra times; avgdl — one
    * exact double — is read off the cached tf frame as a driver
    * scalar (the documents.count() discipline) instead of a 1-row
    * broadcast join; and ONE hash repartition on qid feeds both the
    * (qid, doc) score aggregation and the rank window (hash(qid)
    * satisfies the agg's (qid, doc) clustering), so the tail is
    * exchange-free until the presentation sort. */
  /** The shared BM25 pipeline state: corpus size, cached tf frame,
    * df/dl aggregates, exact avgdl scalar, and the per-seed query-term
    * table (carrying df). One tokenize pass feeds everything. */
  private[graft] final case class Bm25Parts(n: Double, tf: DataFrame,
      dfw: DataFrame, dl: DataFrame, avgdl: Double, qterms: DataFrame)

  private[graft] def bm25Parts(spark: SparkSession, dir: String): Bm25Parts = {
    val n = Tables(spark, dir).documents.count().toDouble
    val tf = TextAnalysis.docsSpread(spark, dir)
      .select(col("doc_id"), explode(words(col("text"))).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .cache()
    val dfw = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    // Σtf ≡ corpus token total; reading it off the cached tf frame
    // avoids re-running the tokenization (tLogprob's rationale). The
    // division is the same long-sum / double-count op the oracle runs.
    val avgdlV = tf.agg((sum("tf") / lit(n)).as("avgdl")).head().getDouble(0)
    // query-term extraction = the shared TF-IDF keyword ranking
    // (TextAnalysis.tfIdfRank — one copy of the scoring chain),
    // restricted to the seed docs before ranking; df rides along for
    // the idf computation downstream
    // The query-term frame is tiny (|Q|·QTerms rows) but EXPLODES ~df×
    // through the postings join downstream — and AQE, which coalesces
    // post-shuffle partitions by BYTE size, sees only the tiny frame
    // and collapses the whole candidate-generation stage to ONE task
    // (measured: t_bm25's 2M-row score+aggregate+rank tail ran single-
    // threaded, 4.7 s of serial CPU). The fix pins the fan-out width
    // at the SEED-SLICE exchange: an explicit numbered repartition on
    // doc_id (= qid downstream) is exempt from both AQE coalescing and
    // redundant-repartition removal (the cached tf frame is hash(doc,
    // word)-partitioned, so this one is not redundant), it satisfies
    // the keyword-rank window's clustering directly (no ENSURE
    // exchange is inserted for the optimizer to coalesce), and every
    // downstream stage — postings join, (qid, doc) aggregation, rank
    // windows — inherits the width through broadcast joins with no
    // further shuffle.
    val qterms = TextAnalysis.tfIdfRank(
        Tables.pinWidth(tf.filter(col("doc_id") % Bm25QueryMod === 0),
          col("doc_id")), dfw, n)
      .filter(col("rk") <= Bm25QTerms)
      .select(col("doc_id").as("qid"), col("word"), col("df"))
    Bm25Parts(n, tf, dfw, dl, avgdlV, qterms)
  }

  /** The Robertson/Lucene per-term weight over cols (tf, df, dl). */
  private def termExpr(n: Double, avgdl: Double) = {
    val idf = log((lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    idf * (col("tf") * lit(2.2) /
      (col("tf") + lit(Bm25K1) * (lit(0.25) + lit(Bm25B) * (col("dl") / lit(avgdl)))))
  }

  /** Exact scoring + top-k tail over a (qid, word, df, tf, doc_id)
    * candidate stream — shared by the full and MaxScore paths. */
  private def scoreTail(spark: SparkSession, p: Bm25Parts, cand: DataFrame): DataFrame = {
    val rkWin = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("doc_id"))
    Tables.pinWidth(cand
      .join(p.dl, "doc_id")
      .select(col("qid"), col("doc_id"), termExpr(p.n, p.avgdl).as("term")),
      col("qid"), col("doc_id"))
      .groupBy("qid", "doc_id")
      .agg(sort_array(collect_list(col("term"))).as("ts"))
      .select(col("qid"), col("doc_id"),
        stableRound(graft.functions.expr.FoldExpressions.sumArray(col("ts")), 6)
          .as("score"))
      .withColumn("rk", row_number().over(rkWin).cast("long"))
      .filter(col("rk") <= Bm25TopK)
      .select(col("qid"), col("rk"), col("doc_id"), col("score"))
      // No explicit fence here: orderBy's RANGE partitioner runs a
      // SAMPLING job over its child, and an exchange-free child chain
      // would be re-executed by it (measured at 6× gate data: the
      // 200-executor-second scoring stage ran twice under the old
      // hash(qid) pin, t_bm25 25.8 s vs 16.7 unpinned). The (qid,
      // doc_id) pin already fences it: the rank window inserts its own
      // hash(qid) exchange of the WindowGroupLimit-pruned rows, so the
      // sampling pass re-reads that tiny materialized stage instead of
      // recomputing the aggregation (6×: 12.7 s). A localCheckpoint
      // fence was tried and REVERTED: it cut the lex arm out of
      // ReuseExchange for the hybrid/ndcg consumers that embed this
      // frame more than once (t_hybrid_rrf 1.3 → 3.0 s at the gate).
      .orderBy("qid", "rk")
  }

  def tBm25(spark: SparkSession, dir: String): DataFrame = {
    val p = bm25Parts(spark, dir)
    // no broadcast hint on qterms: the mod-derived seed set grows
    // with the corpus (a stand-in for a real bounded query set), so
    // Catalyst/AQE picks broadcast from actual size — it does at
    // every bench sf — without baking the assumption in
    scoreTail(spark, p,
      p.qterms.join(p.tf, "word").filter(col("doc_id") =!= col("qid")))
  }

  val tBm25Sql: String =
    s"""WITH w AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
       |nt AS (SELECT count(*)::DOUBLE AS n FROM documents),
       |tf AS (SELECT doc_id, word, count(*) AS tf
       |       FROM (SELECT doc_id, unnest(w) AS word FROM w) u GROUP BY 1, 2),
       |dfw AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
       |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
       |ad AS (SELECT sum(tf) / (SELECT n FROM nt) AS avgdl FROM tf),
       |qt AS (
       |  SELECT qid, word FROM (
       |    SELECT tf.doc_id AS qid, tf.word,
       |      row_number() OVER (PARTITION BY tf.doc_id ORDER BY
       |        ${stableRoundSql("tf.tf * ln(nt.n / dfw.df)", 6)} DESC, tf.word) AS kw_rk
       |    FROM tf JOIN dfw USING (word) CROSS JOIN nt
       |    WHERE tf.doc_id % $Bm25QueryMod = 0) k
       |  WHERE kw_rk <= $Bm25QTerms),
       |terms AS (
       |  SELECT qt.qid, tf.doc_id,
       |    ln((nt.n - dfw.df + 0.5) / (dfw.df + 0.5) + 1.0) *
       |      (tf.tf * 2.2 /
       |       (tf.tf + $Bm25K1 * (0.25 + $Bm25B * (dl.dl / ad.avgdl)))) AS term
       |  FROM qt JOIN tf USING (word)
       |  JOIN dfw USING (word) JOIN dl ON dl.doc_id = tf.doc_id
       |  CROSS JOIN ad CROSS JOIN nt
       |  WHERE tf.doc_id <> qt.qid),
       |g AS (
       |  SELECT qid, doc_id, list(term ORDER BY term) AS ts
       |  FROM terms GROUP BY qid, doc_id),
       |s AS (
       |  SELECT qid, doc_id,
       |    ${stableRoundSql("list_reduce(list_prepend(0.0, ts), (a, b) -> a + b)", 6)} AS score
       |  FROM g)
       |SELECT qid, rk, doc_id, score FROM (
       |  SELECT qid, doc_id, score,
       |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id)::BIGINT AS rk
       |  FROM s) t
       |WHERE rk <= $Bm25TopK
       |ORDER BY qid, rk""".stripMargin

  /** Fixed-point scale for the integer pruning bound. */
  private val UbQ = 1e6

  /** Query terms whose postings seed the pruning threshold. One term
    * is too brittle on a natural vocabulary (the single top-impact
    * term is rare by construction — its df can be < k, leaving θ
    * unset); a handful fills k while keeping the seed phase bounded. */
  private[graft] val SeedTerms = 4

  /** The fused MaxScore candidate aggregate: one (qid, doc_id) row per
    * candidate pair carrying everything the pruning decision and the
    * exact tail need — `ts` (the sorted exact term list), `ub` (the
    * integer upper bound Σ⌈U(w)·1e6⌉ over matched terms), `pq` (the
    * integer seed partial score Σ⌊term·1e6⌋ over matched seed terms;
    * null when none matched) and `thetaq` (the query's pruning
    * threshold — the [[Bm25TopK]]-th best pq, null when fewer than k
    * docs matched a seed term: keep-all fallback).
    *
    * Stage economy — this used to be four separate pipelines (impact
    * bounds off a tf semi-join, a seed-phase postings⋈dl join, an
    * upper-bound aggregation, then a survivor semi-join feeding a
    * SECOND (qid, doc) shuffle in the exact tail), whose fixed job
    * count made the op lose 2× to its unpruned twin on a loaded bench
    * host despite pruning. Now ONE postings⋈dl pass computes the exact
    * per-(qid, word, doc) term, is hash-repartitioned on qid, and
    * every downstream consumer rides that single exchange: the impact
    * bound is ⌈1e6·max(term)⌉ per word (a map-side-combined regroup of
    * the same cached frame — idf > 0 makes per-row max(idf·sat) ≡
    * idf·max(sat), and correctly-rounded multiplication is monotone,
    * so the bound is bit-identical to the two-step form and tighter
    * than a corpus-wide one: the max runs over exactly the scored
    * pairs), seed membership joins back as a broadcast ≤|Q|·SeedTerms
    * flag table, the (qid, doc) aggregation needs no new exchange
    * (hash(qid) already clusters it), and θ is two stacked windows on
    * the aggregate's own partitioning instead of a self-join.
    *
    * Exactness is unchanged from the two-phase form: pq ≤ ⌊true·1e6⌋
    * (a positive-term subset, and Σfloor ≤ floor of the real sum), so
    * θ — the kth best pq — lower-bounds the kth best true score; ub ≥
    * true·1e6 (per-term ceiling of a per-word max); both sides are
    * integers, so the ±1-quantum tie closes; pruning never rides on
    * float summation order. */
  private[graft] def maxScoreAgg(spark: SparkSession, p: Bm25Parts): DataFrame = {
    val scored = Tables.pinWidth(p.qterms.join(p.tf, "word")
      .filter(col("doc_id") =!= col("qid"))
      .join(p.dl, "doc_id")
      .select(col("qid"), col("word"), col("doc_id"),
        termExpr(p.n, p.avgdl).as("term")),
      col("qid"))
      .cache()
    val impacts = scored.groupBy("word")
      .agg(ceil(max(col("term")) * lit(UbQ)).cast("long").as("uq"))
    // seed phase: each query's few highest-impact terms, as a flag
    val topWin = Window.partitionBy(col("qid"))
      .orderBy(col("uq").desc, col("word"))
    val seedTerms = p.qterms.join(impacts, "word")
      .withColumn("trk", row_number().over(topWin))
      .filter(col("trk") <= SeedTerms)
      .select(col("qid"), col("word"), lit(true).as("seed"))
    // θ without a self-join: rank docs by seed partial score, then
    // spread the kth value across the query's rows. desc_nulls_last
    // puts no-seed-match docs after every ranked one, so a query with
    // < k seed-phase docs finds pq null at rank k ⇒ thetaq null.
    val thetaWin = Window.partitionBy(col("qid"))
      .orderBy(col("pq").desc_nulls_last)
    val qWin = Window.partitionBy(col("qid"))
    scored
      .join(broadcast(impacts), "word")
      .join(broadcast(seedTerms), Seq("qid", "word"), "left")
      .groupBy("qid", "doc_id")
      .agg(
        sort_array(collect_list(col("term"))).as("ts"),
        sum(col("uq")).as("ub"),
        sum(when(col("seed"), floor(col("term") * lit(UbQ)).cast("long"))).as("pq"))
      .withColumn("prk", row_number().over(thetaWin))
      .withColumn("thetaq",
        max(when(col("prk") === lit(Bm25TopK), col("pq"))).over(qWin))
  }

  /** The pruning predicate over [[maxScoreAgg]]'s columns. */
  private[graft] def maxScoreKeep: Column =
    col("thetaq").isNull || col("ub") >= col("thetaq")

  /** t_bm25_maxscore — the same exact top-k as [[tBm25]] (same SQL
    * oracle — the gate's hash-match IS the exactness proof) with
    * WAND/MaxScore-style candidate pruning adapted to a batch engine:
    * documents whose matched-term impact bounds cannot reach the
    * query's seed-phase threshold never enter the exact float fold or
    * the rank window. On the degenerate uniform-vocabulary driver
    * corpus the bound prunes little (every term's postings are dense
    * and scores are flat — measured in ZipfBm25Spec); on a mixed
    * Zipfian corpus the threshold separates and the exact phase
    * shrinks — the same corpus-shape story as d_dedup_ngram's prefix
    * filter, measured the same way. The whole op is ONE candidate
    * exchange plus windows on its own partitioning ([[maxScoreAgg]]). */
  def tBm25MaxScore(spark: SparkSession, dir: String): DataFrame = {
    val p = bm25Parts(spark, dir)
    val rkWin = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("doc_id"))
    maxScoreAgg(spark, p)
      .filter(maxScoreKeep)
      .select(col("qid"), col("doc_id"),
        stableRound(graft.functions.expr.FoldExpressions.sumArray(col("ts")), 6)
          .as("score"))
      .withColumn("rk", row_number().over(rkWin).cast("long"))
      .filter(col("rk") <= Bm25TopK)
      .select(col("qid"), col("rk"), col("doc_id"), col("score"))
      // presentation fence — the scoreTail rationale: the pruning
      // windows + exact fold are exchange-free on the pin, and the
      // final orderBy's range-sampling pass would re-execute them all
      .localCheckpoint(false)
      .orderBy("qid", "rk")
  }

  /** RRF constant (Cormack/Clarke/Buettcher 2009's k=60 — the value
    * every production fusion stack defaults to). */
  val RrfK = 60

  /** t_hybrid_rrf — HYBRID lexical+vector retrieval via reciprocal-
    * rank fusion, the standard first-stage of a modern RAG/search
    * stack: each seed query retrieves a lexical top-k (the [[tBm25]]
    * ranking over `documents`) and a vector top-k (exact cosine over
    * the id-aligned `embeddings` table, same seed set), and the two
    * rank lists fuse by RRF — score(d) = Σ_arms 1/(k + rank_arm(d)),
    * k = [[RrfK]], missing arm contributing 0 — re-ranked to the
    * fused top-[[Bm25TopK]].
    *
    * Scale shape: each arm keeps its own scan discipline (BM25's
    * candidate stream bounded by Σdf over broadcast query terms; the
    * vector arm a broadcast-queries narrow corpus scan with bounded
    * per-partition heaps — the [[Similarity.sAnnBrute]] plan), and
    * the FUSION works on rank lists only — two ≤ |Q|·k-row frames,
    * join and window costs independent of corpus size. That is the
    * whole point of late fusion at 100 TB: modalities never meet at
    * corpus scale, only at rank-list scale.
    *
    * Float parity: ranks are integers, so the fused score is the sum
    * of two correctly-rounded double divisions spelled in the same
    * order in both engines; ranking ties break on doc_id. */
  def tHybridRrf(spark: SparkSession, dir: String): DataFrame =
    fuse(lexArm(spark, dir), vecArm(spark, dir), lit(1.0), lit(1.0))

  /** The lexical arm's rank list: [[tBm25]]'s top-k as (qid, doc_id,
    * rl). */
  private[graft] def lexArm(spark: SparkSession, dir: String): DataFrame =
    tBm25(spark, dir).select(col("qid"), col("doc_id"), col("rk").as("rl"))

  /** The vector arm's rank list: exact cosine top-k over the
    * id-aligned `embeddings` table, same seed ids, as (qid, doc_id,
    * rv) — broadcast queries, narrow corpus scan, bounded
    * per-partition heaps (the [[Similarity.sAnnBrute]] plan). */
  private[graft] def vecArm(spark: SparkSession, dir: String): DataFrame = {
    val e = Similarity.withUnit(
      Similarity.embSpread(spark, dir), "embedding", "u")
    val qv = e.filter(col("vec_id") % Bm25QueryMod === 0)
      .select(col("vec_id").as("query_id"), col("u").as("qv"))
    val scored = e.select(col("vec_id").as("neighbor_id"), col("u").as("nv"))
      .join(broadcast(qv), col("query_id") =!= col("neighbor_id"))
      .withColumn("score", stableRound(Similarity.dot(col("qv"), col("nv")), 4))
    val wv = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    Similarity.heapPartials(scored, Bm25TopK, "score")
      .withColumn("rv", row_number().over(wv).cast("long"))
      .filter(col("rv") <= Bm25TopK)
      .select(col("query_id").as("qid"), col("neighbor_id").as("doc_id"),
        col("rv"))
  }

  /** Shared late-fusion skeleton: full-outer-join the two rank lists,
    * score = wl/(k+rl) + wv/(k+rv) (missing arm contributes 0),
    * re-rank to the fused top-[[Bm25TopK]]. `attach` lets a caller
    * join per-run state (e.g. learned weights — a broadcast 1-row
    * frame) onto the rank pairs before scoring; fusion cost stays
    * rank-list-sized either way. */
  private def fuse(lex: DataFrame, vec: DataFrame, wl: Column, wv: Column,
      attach: DataFrame => DataFrame = identity): DataFrame = {
    val wf = Window.partitionBy(col("qid"))
      .orderBy(col("rrf").desc, col("doc_id"))
    attach(lex.join(vec, Seq("qid", "doc_id"), "full_outer"))
      .select(col("qid"), col("doc_id"),
        stableRound(
          when(col("rl").isNotNull, wl / (lit(RrfK) + col("rl")))
            .otherwise(lit(0.0)) +
          when(col("rv").isNotNull, wv / (lit(RrfK) + col("rv")))
            .otherwise(lit(0.0)), 6).as("rrf"))
      .withColumn("rk", row_number().over(wf).cast("long"))
      .filter(col("rk") <= Bm25TopK)
      .select(col("qid"), col("rk"), col("doc_id"), col("rrf"))
      .orderBy("qid", "rk")
  }

  /** Fixed per-arm weights for [[tHybridWrrf]]: lexical-heavy, the
    * common production prior for keyword-like corpora. Spelled once;
    * the SQL oracle renders the same literals. */
  private[graft] val WrrfLex = 0.7
  private[graft] val WrrfVec = 0.3

  /** t_hybrid_wrrf — weighted reciprocal-rank fusion: identical
    * late-fusion shape to [[tHybridRrf]] but each arm's reciprocal
    * rank is scaled by a fixed prior weight (wl/(k+rl) + wv/(k+rv)).
    * Float parity: each term is one double literal divided by an
    * integer, correctly rounded and spelled in the same order in both
    * engines — the same discipline the unweighted fusion proved. */
  def tHybridWrrf(spark: SparkSession, dir: String): DataFrame =
    fuse(lexArm(spark, dir), vecArm(spark, dir), lit(WrrfLex), lit(WrrfVec))

  /** t_hybrid_learned — fusion weights LEARNED from the corpus
    * instead of fixed: each arm's weight is its share of
    * weak-relevance hits, where the weak label for (q, d) is "same
    * `source` as the query doc" (the documents table's provenance
    * column — the standard weak-supervision proxy when no click log
    * exists). wl = hitsLex/(hitsLex+hitsVec), wv likewise; fused
    * score = wl/(k+rl) + wv/(k+rv). Training is CLOSED-FORM — two
    * integer hit counts over the rank lists joined to a broadcast
    * (doc_id, source) dimension — so the whole train+fuse pipeline
    * replays exactly in SQL and the gate hash-match proves the
    * learned weights, not just the fusion ([[Classify]]'s ln-parity
    * discipline, applied to fusion). Scale shape: labels and hits
    * live on the rank lists (|Q|·k rows); the corpus is never
    * rescanned. Per-segment weights (by lang, by query class) are a
    * groupBy on the same hit frame — the pooled variant is the gate.
    * An IRLS refinement over rank features is the documented
    * extension; on two monotone features it reduces to the same
    * arm-preference ordering this ratio already captures. */
  def tHybridLearned(spark: SparkSession, dir: String): DataFrame = {
    // each arm feeds BOTH the hit counting and the fusion — cache the
    // (tiny, |Q|·k-row) rank lists so the expensive arm pipelines run
    // once, not twice
    val lexL = lexArm(spark, dir).cache()
    val vecL = vecArm(spark, dir).cache()
    val src = graft.core.Tables(spark, dir).documents
      .select(col("doc_id"), col("source"))
    def hits(arm: DataFrame, name: String): DataFrame =
      arm.join(broadcast(src.select(col("doc_id").as("qid"),
          col("source").as("qsrc"))), "qid")
        .join(broadcast(src.select(col("doc_id"),
          col("source").as("dsrc"))), "doc_id")
        .agg(coalesce(sum(when(col("qsrc") === col("dsrc"), lit(1L))
          .otherwise(lit(0L))), lit(0L)).as(name))
    val w = hits(lexL, "hl")
      .crossJoin(hits(vecL, "hv"))
      .select(
        when(col("hl") + col("hv") === 0, lit(0.5))
          .otherwise(col("hl").cast("double") /
            (col("hl") + col("hv")).cast("double")).as("wl"),
        when(col("hl") + col("hv") === 0, lit(0.5))
          .otherwise(col("hv").cast("double") /
            (col("hl") + col("hv")).cast("double")).as("wv"))
    fuse(lexL, vecL, col("wl"), col("wv"),
      attach = _.crossJoin(broadcast(w)))
  }

  /** t_rerank — SECOND-STAGE reranking over the fused first-stage
    * list: the hybrid top-k ([[tHybridRrf]]) is re-scored by exact
    * query-containment — |distinct words of the query doc ∩ distinct
    * words of the candidate| / |query words| — and re-ranked by
    * (containment desc, first-stage score desc, doc_id). This is the
    * cascade every production retrieval stack runs: a cheap first
    * stage scans the corpus, an expensive exact feature touches ONLY
    * the |Q|·k survivors. The containment feature here reads the
    * shared tokenize frame semi-joined down to the fused candidates —
    * the same shape a cross-encoder rerank would use to re-read just
    * k documents per query at 100 TB (feature cost ∝ |Q|·k, never
    * corpus). Containment is integer/integer (one exact double
    * division), so the rerank is hash-green end-to-end on top of the
    * already-hash-green fusion. */
  def tRerank(spark: SparkSession, dir: String): DataFrame = {
    val p = bm25Parts(spark, dir)
    // the fused list is both the candidate filter and the output
    // spine — cache the (|Q|·k)-row frame, not the corpus
    val fused = tHybridRrf(spark, dir).cache()
    val qwords = p.tf.filter(col("doc_id") % Bm25QueryMod === 0)
      .select(col("doc_id").as("qid"), col("word"))
    val qn = qwords.groupBy("qid").agg(count(lit(1)).as("qn"))
    val cwords = p.tf.select(col("doc_id"), col("word"))
      .join(fused.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
    val ov = qwords.join(cwords, "word")
      .groupBy("qid", "doc_id").agg(count(lit(1)).as("ov"))
    val wr = Window.partitionBy(col("qid"))
      .orderBy(col("cont").desc, col("rrf").desc, col("doc_id"))
    fused.join(ov, Seq("qid", "doc_id"), "left")
      .join(qn, "qid")
      .select(col("qid"), col("doc_id"), col("rrf"),
        stableRound(coalesce(col("ov"), lit(0L)).cast("double") /
          col("qn").cast("double"), 6).as("cont"))
      .withColumn("rk", row_number().over(wr).cast("long"))
      .select(col("qid"), col("rk"), col("doc_id"), col("cont"))
      .orderBy("qid", "rk")
  }

  private val vecArmSql: String =
    s"""  SELECT qid, doc_id, rv FROM (
       |    SELECT q.vec_id AS qid, n.vec_id AS doc_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY floor((list_cosine_similarity(q.embedding::DOUBLE[], n.embedding::DOUBLE[])) * 1e4 + 0.5) / 1e4 DESC,
       |                 n.vec_id)::BIGINT AS rv
       |    FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
       |    WHERE q.vec_id % $Bm25QueryMod = 0) t
       |  WHERE rv <= $Bm25TopK""".stripMargin

  /** One fusion oracle for all three hybrid variants: the weight
    * expressions (and any extra training CTEs feeding them) are the
    * only thing that varies — exactly mirroring [[fuse]]. */
  private def hybridFusionSql(wl: String, wv: String,
      extraCtes: String = "", weightJoin: String = ""): String =
    s"""WITH lex AS (
       |$tBm25Sql
       |),
       |vec AS (
       |$vecArmSql)$extraCtes,
       |f AS (
       |  SELECT coalesce(lex.qid, vec.qid) AS qid,
       |    coalesce(lex.doc_id, vec.doc_id) AS doc_id,
       |    ${stableRoundSql(
            s"coalesce($wl / ($RrfK + lex.rk), 0.0) + " +
              s"coalesce($wv / ($RrfK + vec.rv), 0.0)", 6)} AS rrf
       |  FROM lex FULL OUTER JOIN vec
       |    ON lex.qid = vec.qid AND lex.doc_id = vec.doc_id$weightJoin)
       |SELECT qid, rk, doc_id, rrf FROM (
       |  SELECT qid, doc_id, rrf,
       |    row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id)::BIGINT AS rk
       |  FROM f) t
       |WHERE rk <= $Bm25TopK
       |ORDER BY qid, rk""".stripMargin

  val tHybridRrfSql: String =
    hybridFusionSql("1.0::DOUBLE", "1.0::DOUBLE")

  val tHybridWrrfSql: String =
    hybridFusionSql(s"$WrrfLex::DOUBLE", s"$WrrfVec::DOUBLE")

  val tHybridLearnedSql: String = hybridFusionSql("w.wl", "w.wv",
    extraCtes = s""",
       |src AS (SELECT doc_id, source FROM documents),
       |lh AS (
       |  SELECT coalesce(sum(CASE WHEN q.source = d.source THEN 1 ELSE 0 END), 0)::BIGINT AS hl
       |  FROM lex JOIN src q ON lex.qid = q.doc_id
       |           JOIN src d ON lex.doc_id = d.doc_id),
       |vh AS (
       |  SELECT coalesce(sum(CASE WHEN q.source = d.source THEN 1 ELSE 0 END), 0)::BIGINT AS hv
       |  FROM vec JOIN src q ON vec.qid = q.doc_id
       |           JOIN src d ON vec.doc_id = d.doc_id),
       |w AS (
       |  SELECT CASE WHEN hl + hv = 0 THEN 0.5 ELSE hl::DOUBLE / (hl + hv)::DOUBLE END AS wl,
       |    CASE WHEN hl + hv = 0 THEN 0.5 ELSE hv::DOUBLE / (hl + hv)::DOUBLE END AS wv
       |  FROM lh, vh)""".stripMargin,
    weightJoin = " CROSS JOIN w")

  val tRerankSql: String =
    s"""WITH fused AS (
       |$tHybridRrfSql
       |),
       |w2 AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
       |tf2 AS (SELECT doc_id, word
       |        FROM (SELECT doc_id, unnest(w) AS word FROM w2) u GROUP BY 1, 2),
       |qw AS (SELECT doc_id AS qid, word FROM tf2 WHERE doc_id % $Bm25QueryMod = 0),
       |qn AS (SELECT qid, count(*) AS qn FROM qw GROUP BY 1),
       |cw AS (SELECT doc_id, word FROM tf2
       |       WHERE doc_id IN (SELECT doc_id FROM fused)),
       |ov AS (SELECT qw.qid, cw.doc_id, count(*) AS ov
       |       FROM qw JOIN cw ON qw.word = cw.word GROUP BY 1, 2),
       |r AS (
       |  SELECT f.qid, f.doc_id, f.rrf,
       |    ${stableRoundSql("coalesce(ov.ov, 0)::DOUBLE / qn.qn::DOUBLE", 6)} AS cont
       |  FROM fused f JOIN qn ON f.qid = qn.qid
       |  LEFT JOIN ov ON f.qid = ov.qid AND f.doc_id = ov.doc_id)
       |SELECT qid, rk, doc_id, cont FROM (
       |  SELECT qid, doc_id, cont,
       |    row_number() OVER (PARTITION BY qid
       |      ORDER BY cont DESC, rrf DESC, doc_id)::BIGINT AS rk
       |  FROM r) t
       |WHERE rk <= $Bm25TopK
       |ORDER BY qid, rk""".stripMargin


  /** t_retrieval_eval — per-segment retrieval QUALITY over the rank
    * lists: for each arm (lexical BM25, vector cosine) and each query
    * source segment, the weak-relevance hit rate (share of retrieved
    * (q, d) pairs where d shares the query doc's `source` — the same
    * weak label [[tHybridLearned]] trains on). This is the eval loop
    * the retrieval family owes itself (the [[Dedup]] d_dedup_eval /
    * t_lang_eval discipline): the segment-level numbers say WHERE an
    * arm is weak — exactly what decides per-segment fusion weights,
    * probe depths, or index rebuilds — where the pooled learned
    * weight only says which arm wins on average.
    *
    * Scale shape: everything after the arms runs on the |Q|·k rank
    * lists joined to a broadcast (doc_id, source) dimension — the
    * corpus is never rescanned (the late-fusion rule applied to
    * evaluation). Counts are integers; the rate is one exact int/int
    * double division, stableRounded — hash-green. */
  def tRetrievalEval(spark: SparkSession, dir: String): DataFrame =
    retrievalEvalBy(spark, dir, byLang = false)

  /** t_retrieval_eval_seg — the same eval rolled up by QUERY LANGUAGE
    * instead of source: the cross-source aggregation the per-source
    * row cannot show (each query doc carries a near-unique source, so
    * the source grid is per-query; languages genuinely pool several
    * queries). A lang whose hit rate collapses in one arm is the
    * concrete trigger for per-lang fusion weights or a per-lang index
    * rebuild. Same |Q|·k-bounded shape; only the groupBy key moves. */
  def tRetrievalEvalSeg(spark: SparkSession, dir: String): DataFrame =
    retrievalEvalBy(spark, dir, byLang = true)

  /** Shared skeleton of the two eval rows: hit labels stay the weak
    * source-match either way; `byLang` swaps the grouping from the
    * per-source grid to the per-language rollup. */
  private def retrievalEvalBy(spark: SparkSession, dir: String,
      byLang: Boolean): DataFrame = {
    val docs = graft.core.Tables(spark, dir).documents
    val segCols = if (byLang) Seq("qlang") else Seq("qsrc")
    val qdim = docs.select(col("doc_id").as("qid"),
      col("source").as("qsrc"),
      col("lang").as("qlang"))
    def evalArm(arm: DataFrame, name: String): DataFrame =
      arm.join(broadcast(qdim), "qid")
        .join(broadcast(docs.select(col("doc_id"),
          col("source").as("dsrc"))), "doc_id")
        .groupBy(segCols.map(col): _*)
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("qsrc") === col("dsrc"), lit(1L))
            .otherwise(lit(0L))).as("hits"))
        .select(lit(name).as("arm") +: segCols.map(col) ++: Seq(
          col("n_pairs"), col("hits"),
          stableRound(col("hits").cast("double") /
            col("n_pairs").cast("double"), 6).as("hit_rate")): _*)
    evalArm(lexArm(spark, dir), "lex")
      .unionByName(evalArm(vecArm(spark, dir), "vec"))
      .orderBy("arm" +: segCols map col: _*)
  }

  /** Shared SQL skeleton of the two eval oracles (the ONE copy, like
    * the Spark-side [[retrievalEvalBy]]). */
  private def retrievalEvalSqlBy(byLang: Boolean): String = {
    val qsel = if (byLang) "q.lang AS qlang" else "q.source AS qsrc"
    val gb = "GROUP BY 2"
    val segOut = if (byLang) "qlang" else "qsrc"
    s"""WITH lex AS (
       |$tBm25Sql
       |),
       |vec AS (
       |$vecArmSql),
       |src AS (SELECT doc_id, source, lang FROM documents),
       |le AS (
       |  SELECT 'lex' AS arm, $qsel, count(*)::BIGINT AS n_pairs,
       |    sum(CASE WHEN q.source = d.source THEN 1 ELSE 0 END)::BIGINT AS hits
       |  FROM lex JOIN src q ON lex.qid = q.doc_id
       |           JOIN src d ON lex.doc_id = d.doc_id
       |  $gb),
       |ve AS (
       |  SELECT 'vec' AS arm, $qsel, count(*)::BIGINT AS n_pairs,
       |    sum(CASE WHEN q.source = d.source THEN 1 ELSE 0 END)::BIGINT AS hits
       |  FROM vec JOIN src q ON vec.qid = q.doc_id
       |           JOIN src d ON vec.doc_id = d.doc_id
       |  $gb),
       |u AS (SELECT * FROM le UNION ALL SELECT * FROM ve)
       |SELECT arm, $segOut, n_pairs, hits,
       |  ${stableRoundSql("hits::DOUBLE / n_pairs::DOUBLE", 6)} AS hit_rate
       |FROM u
       |ORDER BY arm, $segOut""".stripMargin
  }

  val tRetrievalEvalSql: String = retrievalEvalSqlBy(byLang = false)
  val tRetrievalEvalSegSql: String = retrievalEvalSqlBy(byLang = true)

  // ------------------------------------------------------------ nDCG

  /** t_ndcg — rank-position-aware retrieval eval: nDCG@k of each
    * arm's rank list per query, under the same weak source-match
    * relevance the hit-rate evals use. Hit rate ([[tRetrievalEval]])
    * says how MANY of the top-k are relevant; nDCG says WHERE they
    * rank (a relevant doc at rank 1 vs rank 10 is the difference a
    * reranker is paid for), which is the number a cascade tunes its
    * second stage against. DCG = Σ_hits ln2/ln(rank+1); IDCG places
    * the query's min(k, n_rel) relevant docs at the top ranks
    * (n_rel = same-source docs excluding the query; both arms exclude
    * the seed, so nDCG ≤ 1 structurally).
    *
    * Scale shape: the late-fusion evaluation rule again — everything
    * runs on the |Q|·k rank lists joined to a broadcast (doc_id,
    * source) dimension plus a per-source count; the corpus is never
    * rescanned. Float parity: gain terms use the t_bigram_lm-proven
    * ln on integer ranks, the per-query DCG folds rank-ascending over
    * a ≤k-element sorted list, IDCG is a FIXED sum of k rank-guarded
    * terms spelled identically in both engines, and outputs round
    * once. */
  def tNdcg(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.core.Tables(spark, dir).documents
    val src = docs.select(col("doc_id"), col("source"))
    val srcCnt = src.groupBy("source").agg(count(lit(1)).as("scnt"))
    val relq = src.join(srcCnt, "source")
      .filter(col("doc_id") % Bm25QueryMod === 0)
      .select(col("doc_id").as("qid"), (col("scnt") - 1L).as("n_rel"))
    def armDcg(arm: DataFrame, rankCol: String, name: String): DataFrame =
      arm
        .join(broadcast(src.select(col("doc_id").as("qid"),
          col("source").as("qsrc"))), "qid")
        .join(broadcast(src.select(col("doc_id"),
          col("source").as("dsrc"))), "doc_id")
        .select(col("qid"), col(rankCol).as("r"),
          when(col("qsrc") === col("dsrc"),
            log(lit(2.0)) / log((col(rankCol) + 1L).cast("double")))
            .otherwise(lit(0.0)).as("term"))
        .groupBy("qid")
        .agg(sort_array(collect_list(struct(col("r"), col("term"))))
          .as("ts"))
        .select(lit(name).as("arm"), col("qid"),
          graft.functions.expr.FoldExpressions.sumArrayField(col("ts"), "term").as("dcg"))
    // IDCG: k fixed rank-guarded terms summed left-to-right — the
    // engine-mirrorable spelling of Σ_{i=1..min(k,n_rel)} ln2/ln(i+1)
    val idcgExpr = (1 to Bm25TopK).map(i =>
        when(col("m") >= i, log(lit(2.0)) / log(lit((i + 1).toDouble)))
          .otherwise(lit(0.0)))
      .reduceLeft(_ + _)
    val idcg = relq
      .withColumn("m", least(lit(Bm25TopK.toLong), col("n_rel")))
      .select(col("qid"), col("n_rel"), idcgExpr.as("idcg"))
    armDcg(lexArm(spark, dir), "rl", "lex")
      .unionByName(armDcg(vecArm(spark, dir), "rv", "vec"))
      .join(broadcast(idcg), Seq("qid"))
      .select(col("arm"), col("qid"), col("n_rel"),
        stableRound(col("dcg"), 6).as("dcg"),
        stableRound(col("idcg"), 6).as("idcg"),
        when(col("idcg") > 0, stableRound(col("dcg") / col("idcg"), 6))
          .otherwise(lit(0.0)).as("ndcg"))
      .orderBy("arm", "qid")
  }

  val tNdcgSql: String = {
    val idcgTerms = (1 to Bm25TopK).map(i =>
      s"(CASE WHEN m >= $i THEN ln(2.0) / ln(${i + 1}.0) ELSE 0.0 END)")
      .mkString(" + ")
    s"""WITH lex AS (
       |$tBm25Sql
       |),
       |vec AS (
       |$vecArmSql),
       |src AS (SELECT doc_id, source FROM documents),
       |sc AS (SELECT source, count(*)::BIGINT AS scnt FROM src GROUP BY 1),
       |relq AS (
       |  SELECT src.doc_id AS qid, sc.scnt - 1 AS n_rel
       |  FROM src JOIN sc USING (source)
       |  WHERE src.doc_id % $Bm25QueryMod = 0),
       |terms AS (
       |  SELECT 'lex' AS arm, lex.qid, lex.rk AS r,
       |    CASE WHEN q.source = d.source
       |         THEN ln(2.0) / ln((lex.rk + 1)::DOUBLE) ELSE 0.0 END AS term
       |  FROM lex JOIN src q ON lex.qid = q.doc_id
       |           JOIN src d ON lex.doc_id = d.doc_id
       |  UNION ALL
       |  SELECT 'vec' AS arm, vec.qid, vec.rv AS r,
       |    CASE WHEN q.source = d.source
       |         THEN ln(2.0) / ln((vec.rv + 1)::DOUBLE) ELSE 0.0 END AS term
       |  FROM vec JOIN src q ON vec.qid = q.doc_id
       |           JOIN src d ON vec.doc_id = d.doc_id),
       |dcg AS (
       |  SELECT arm, qid,
       |    list_reduce(list_prepend(0.0, list(term ORDER BY r)),
       |      (a, b) -> a + b) AS dcg
       |  FROM terms GROUP BY arm, qid),
       |idcg AS (
       |  SELECT qid, n_rel, $idcgTerms AS idcg
       |  FROM (SELECT qid, n_rel, least($Bm25TopK, n_rel) AS m FROM relq) t)
       |SELECT d.arm, d.qid, i.n_rel,
       |  ${stableRoundSql("d.dcg", 6)} AS dcg,
       |  ${stableRoundSql("i.idcg", 6)} AS idcg,
       |  CASE WHEN i.idcg > 0 THEN ${stableRoundSql("d.dcg / i.idcg", 6)}
       |       ELSE 0.0 END AS ndcg
       |FROM dcg d JOIN idcg i USING (qid)
       |ORDER BY arm, qid""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_bm25" -> tBm25,
    "t_ndcg" -> tNdcg,
    "t_bm25_maxscore" -> tBm25MaxScore,
    "t_hybrid_rrf" -> tHybridRrf,
    "t_hybrid_wrrf" -> tHybridWrrf,
    "t_hybrid_learned" -> tHybridLearned,
    "t_rerank" -> tRerank,
    "t_retrieval_eval" -> tRetrievalEval,
    "t_retrieval_eval_seg" -> tRetrievalEvalSeg,
  )

  def oracles: Map[String, String] = Map(
    "t_bm25" -> tBm25Sql,
    "t_ndcg" -> tNdcgSql,
    // the MaxScore path must produce the identical exact top-k — the
    // shared oracle is the point (pruning that changed results would
    // hash-mismatch at the gate)
    "t_bm25_maxscore" -> tBm25Sql,
    "t_hybrid_rrf" -> tHybridRrfSql,
    "t_hybrid_wrrf" -> tHybridWrrfSql,
    "t_hybrid_learned" -> tHybridLearnedSql,
    "t_rerank" -> tRerankSql,
    "t_retrieval_eval" -> tRetrievalEvalSql,
    "t_retrieval_eval_seg" -> tRetrievalEvalSegSql,
  )
}
