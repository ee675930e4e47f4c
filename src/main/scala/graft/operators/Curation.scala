package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Parity.{stableRound, stableRoundSql}
import graft.functions.TextFunctions._

/** Corpus-curation operators: the steps between "raw crawl" and
  * "training corpus" that aren't dedup or scoring themselves —
  * deterministic sampling, denylist scrubbing, and the composed
  * end-to-end curation pipeline.
  *
  * Everything here is hash-deterministic (no RNG state): the same doc
  * makes the same decision in any engine, on any cluster, under any
  * partitioning — which is what makes a 100 TB curation run
  * reproducible and incrementally extendable (appending a batch never
  * changes decisions for existing docs).
  */
object Curation {

  // -------------------------------------------------------- d_sample

  /** Per-language sampling rates, in basis points of 10000 — the
    * "rebalance the corpus" shape: downsample the dominant language,
    * keep the rare ones whole. */
  private val SampleRates: Seq[(String, Int)] =
    Seq("en" -> 2500, "de" -> 5000, "es" -> 5000, "fr" -> 5000, "zh" -> 10000)
  private val DefaultRate = 5000

  /** Stratified deterministic sampling: each doc is kept iff
    * md5("smp:" + doc_id) mod 10000 falls under its language's rate.
    * Rate-based (not exact-K) on purpose: the decision is per-row with
    * NO shuffle and no stratum-size lookup, so the operator is a
    * narrow map at any scale, and decisions are stable under appends —
    * the properties a production sampler needs. The "smp:" salt keeps
    * the decision independent of [[Dedup.dSplit]]'s hash. */
  def dSample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val h = conv(substring(md5(concat(lit("smp:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
      .cast("long") % 10000
    val rate = SampleRates.foldRight(lit(DefaultRate): org.apache.spark.sql.Column) {
      case ((l, r), acc) => when(col("lang") === l, r).otherwise(acc)
    }
    d.filter(h < rate)
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  val dSampleSql: String = {
    val rateCase = SampleRates
      .map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
      .mkString("CASE ", " ", s" ELSE $DefaultRate END")
    s"""SELECT doc_id, lang, source
       |FROM documents
       |WHERE ('0x' || substr(md5('smp:' || doc_id::VARCHAR), 1, 8))::BIGINT % 10000
       |      < $rateCase
       |ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------------- d_budget

  /** Per-language word-token budget for [[dBudget]] — sized so the cut
    * lands mid-corpus in every test SF (each language carries ≥ ~3.5k
    * tokens at sf0.001). */
  val BudgetTokensPerLang = 2000L

  /** d_budget — cut the corpus to a fixed word-token budget PER
    * LANGUAGE in deterministic doc_id order: a doc is kept iff its
    * language's running token total BEFORE it is under
    * [[BudgetTokensPerLang]]. This is the "take the first N tokens of
    * each language" step of assembling a pretraining mixture with
    * pinned per-language token counts — [[dSample]] rebalances by
    * RATE; this op hits an absolute token TARGET, deterministically.
    *
    * The running total is a KEYED distributed prefix sum —
    * [[TextAnalysis.tPack]]'s two-narrow-pass scheme generalized from
    * one global sum to one per language. The tempting one-liner,
    * `sum() OVER (PARTITION BY lang ORDER BY doc_id)`, pulls each
    * language's ENTIRE corpus into one reducer — and a language is not
    * small (English alone is most of a 100 TB crawl). Instead the
    * corpus range-partitions by (lang, doc_id) — one language may span
    * MANY partitions — each partition computes local per-language
    * sums, the ≤ partitions × languages (pid, lang, sum) triples
    * prefix on the driver (tiny, like t_pack's per-partition totals),
    * and a second narrow pass adds each (partition, language) base and
    * applies the keep rule. Both passes are narrow; the only exchange
    * is the range partitioning itself. The kept/cut decision compares
    * integers, so the output is engine-exact with no rounding step. */
  def dBudget(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // per-call lazy localCheckpoint freezes the sampled range
    // boundaries both passes share — the budgetPack discipline (no
    // shared cache slot; blocks released when the frame is dropped)
    val toks = TextAnalysis.docsSpread(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(words(col("text"))).cast("long").as("word_tokens"))
      .repartitionByRange(parts, col("lang"), col("doc_id"))
      .sortWithinPartitions("lang", "doc_id")
      .localCheckpoint(false)
    // pass 1: per-(partition, language) token sums — ≤ parts × |langs|
    // rows reach the driver
    val partLang = toks
      .select(spark_partition_id().as("pid"), col("lang"), col("word_tokens"))
      .as[(Int, String, Long)]
      .mapPartitions { it =>
        val sums = scala.collection.mutable.LinkedHashMap.empty[(Int, String), Long]
        it.foreach { case (pid, l, n) =>
          sums((pid, l)) = sums.getOrElse((pid, l), 0L) + n
        }
        sums.iterator.map { case ((pid, l), s) => (pid, l, s) }
      }.collect()
    // driver prefix: range partitioning on (lang, doc_id) makes
    // partition-id order = key order within each language, so sorting
    // a language's partial sums by pid and scanning yields each
    // partition's base offset for that language
    val base: Map[(Int, String), Long] = partLang
      .groupBy(_._2)
      .flatMap { case (l, rows) =>
        val byPid = rows.sortBy(_._1)
        byPid.map(_._1).zip(byPid.map(_._3).scanLeft(0L)(_ + _)).map {
          case (pid, off) => (pid, l) -> off
        }
      }
    val budget = BudgetTokensPerLang
    // pass 2: add the base, run the local per-language sum, keep while
    // under budget — narrow over the SAME cached partitioning
    toks
      .select(col("doc_id"), col("lang"), col("word_tokens"),
        spark_partition_id().as("pid"))
      .as[(Long, String, Long, Int)]
      .mapPartitions { it =>
        val run = scala.collection.mutable.HashMap.empty[String, Long]
        it.flatMap { case (id, l, n, pid) =>
          val before = base((pid, l)) + run.getOrElse(l, 0L)
          run(l) = run.getOrElse(l, 0L) + n
          if (before < budget) Some((id, l, n, before)) else None
        }
      }
      .toDF("doc_id", "lang", "word_tokens", "cum_before")
      .orderBy("doc_id")
  }

  val dBudgetSql: String =
    s"""SELECT doc_id, lang, word_tokens, cum_before FROM (
       |  SELECT doc_id, lang, word_tokens,
       |    coalesce(sum(word_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_before
       |  FROM (SELECT doc_id, lang, len(string_split($normSql, ' ')) AS word_tokens
       |        FROM documents) w) t
       |WHERE cum_before < $BudgetTokensPerLang
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------- d_shard

  /** Output shard count for the training-order pass. */
  private val NumShards = 16

  /** Sub-buckets PER SHARD for the order fingerprint — a parameter of
    * the fingerprint definition, like [[NumShards]] itself: each shard's
    * key range splits into this many exact sub-ranges (next 32 key
    * bits), each sub-range is digested by a STREAMING md5 over its
    * ordered ids, and the shard fingerprint is the md5 of its ordered
    * sub-digests. The unit of memory is one digest (16 bytes), never an
    * id list; the unit of work is one sub-range = corpus/(shards×subs)
    * — a spillable per-task sort, not a single aggregation row. Raise
    * it together with NumShards when shards outgrow a task's sort
    * budget (changing it changes the fingerprint, as reordering always
    * must). */
  private val SubBuckets = 64

  /** Deterministic global shuffle + sharding — the last step before
    * training: every doc gets a pseudo-random sort key (md5 of the
    * salted id), the key SPACE is split into [[NumShards]] equal
    * ranges (shard = high 32 key bits × S / 2³²), and each shard is
    * ordered by the full key. Because the split is computed exactly
    * from the key instead of sampled (what `repartitionByRange` would
    * do), assignment is reproducible in any engine and stable under
    * appends, and md5 uniformity balances shard sizes. The assignment
    * is a narrow map; the only corpus shuffle is the per-sub-range
    * gather — at scale each shard is written sorted by its tasks, so
    * the engine never holds a global order anywhere. The output
    * fingerprints each shard's exact doc order, putting the order
    * itself under the oracle gate.
    *
    * The fingerprint is hierarchical so that NO row ever carries a
    * shard's id list (a whole-shard `collect_list` row would be
    * corpus/16 at target scale — far past any row budget): ids stream
    * through a per-(shard, sub-range) MessageDigest inside
    * `mapPartitions` over hash-clustered, in-partition-sorted rows,
    * and only the 16-byte digests aggregate upward. The DuckDB oracle
    * mirrors the same exact two-level construction bit for bit. */
  def dShard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables(spark, dir).documents
    val keyed = d.select(col("doc_id").cast("string").as("id"),
        md5(concat(lit("shard-1:"), col("doc_id").cast("string"))).as("kk"))
      .withColumn("shard",
        expr(s"(cast(conv(substring(kk, 1, 8), 16, 10) as bigint) * $NumShards) div 4294967296"))
      .withColumn("sub",
        expr(s"(cast(conv(substring(kk, 9, 8), 16, 10) as bigint) * $SubBuckets) div 4294967296"))
    // Hash-cluster the corpus so every (shard, sub) group lands whole
    // in one task, sort the task's rows into fingerprint order, then
    // stream each group through an md5 — group boundaries are detected
    // on the fly, so a task holds one digest and one row at a time.
    val subDigests = keyed
      .repartition(col("shard"), col("sub"))
      .sortWithinPartitions("shard", "sub", "kk", "id")
      .select(col("shard"), col("sub"), col("kk"), col("id"))
      .as[(Long, Long, String, String)]
      .mapPartitions { rows =>
        val out = Seq.newBuilder[(Long, Long, Long, String)]
        var cur: (Long, Long) = null
        var md: java.security.MessageDigest = null
        var n = 0L
        def flush(): Unit = if (cur != null)
          out += ((cur._1, cur._2, n,
            md.digest().map("%02x".format(_)).mkString))
        rows.foreach { case (shard, sub, _, id) =>
          if (cur == null || cur._1 != shard || cur._2 != sub) {
            flush()
            cur = (shard, sub)
            md = java.security.MessageDigest.getInstance("MD5")
            n = 0L
          }
          if (n > 0L) md.update(','.toByte)
          md.update(id.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          n += 1L
        }
        flush()
        out.result().iterator
      }
      .toDF("shard", "sub", "n", "sub_fp")
    // Second level runs on ≤ shards×subs digest rows — tiny by
    // construction, so the bounded collect_list here is fine.
    subDigests.groupBy("shard")
      .agg(sum("n").as("n_docs"),
        md5(concat_ws(",",
          transform(array_sort(collect_list(struct(col("sub"), col("sub_fp")))),
            x => x.getField("sub_fp")))).as("order_fp"))
      .orderBy("shard")
  }

  val dShardSql: String =
    s"""WITH k AS (
       |  SELECT doc_id, md5('shard-1:' || doc_id::VARCHAR) AS kk FROM documents),
       |s AS (
       |  SELECT doc_id, kk,
       |    (('0x' || substr(kk, 1, 8))::BIGINT * $NumShards) // 4294967296 AS shard,
       |    (('0x' || substr(kk, 9, 8))::BIGINT * $SubBuckets) // 4294967296 AS sub
       |  FROM k),
       |subs AS (
       |  SELECT shard, sub, count(*) AS n,
       |    md5(string_agg(doc_id::VARCHAR, ',' ORDER BY kk, doc_id::VARCHAR)) AS sub_fp
       |  FROM s GROUP BY shard, sub)
       |SELECT shard, sum(n)::BIGINT AS n_docs,
       |  md5(string_agg(sub_fp, ',' ORDER BY sub)) AS order_fp
       |FROM subs GROUP BY shard
       |ORDER BY shard""".stripMargin

  // ----------------------------------------------------- d_reweight

  /** Target language mixture in basis points (sums to 10000). */
  private val TargetMixBp: Seq[(String, Int)] =
    Seq("en" -> 3000, "de" -> 2000, "es" -> 2000, "fr" -> 2000, "zh" -> 1000)

  /** Domain-mixture reweighting: where [[dSample]] applies FIXED
    * per-language rates, this computes them FROM a target mixture —
    * the largest corpus satisfying the target without upsampling any
    * language (T = min over langs of n_l·10000/target_l, all integer
    * arithmetic so any engine lands on identical rates), then keeps
    * each doc by the same salted-md5 acceptance test. Per-lang counts
    * are one tiny agg broadcast back; the keep decision stays a
    * narrow map, stable under appends of already-counted mixes.
    * Languages outside the target mix are dropped (rate 0). */
  def dReweight(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables(spark, dir).documents
    val tgt = TargetMixBp.toDF("lang", "bp")
    val counts = d.groupBy("lang").agg(count(lit(1)).as("n"))
    val joined = counts.join(tgt, "lang")
    // A target language absent from the corpus makes the mixture
    // unsatisfiable (its T would be 0 docs) — and silently dropping
    // it from the min would return a corpus that LOOKS reweighted but
    // misses a whole mixture component. Fail loudly instead; the
    // langs frame is target-mix-sized, so this collect is trivial.
    val present = joined.select("lang").as[String].collect().toSet
    val missing = TargetMixBp.map(_._1).filterNot(present)
    require(missing.isEmpty,
      s"target-mix languages absent from the corpus: ${missing.mkString(", ")}")
    val t = joined.agg(min(expr("n * 10000 div bp"))).head().getLong(0)
    val rates = joined.select(col("lang"),
      expr(s"bp * ${t}L * 100 div n").as("rate_ppm"))
    d.join(broadcast(rates), "lang")
      .filter(md5_32(concat(lit("rw:"), col("doc_id").cast("string"))) % 1000000
        < col("rate_ppm"))
      .select("doc_id", "lang", "rate_ppm")
      .orderBy("doc_id")
  }

  val dReweightSql: String = {
    val values = TargetMixBp.map { case (l, bp) => s"('$l', $bp)" }.mkString(", ")
    s"""WITH tgt(lang, bp) AS (VALUES $values),
       |counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
       |joined AS (SELECT c.lang, c.n, t.bp FROM counts c JOIN tgt t USING (lang)),
       |tmin AS (SELECT min(n * 10000 // bp) AS t FROM joined),
       |rates AS (
       |  SELECT lang, (bp * (SELECT t FROM tmin) * 100) // n AS rate_ppm
       |  FROM joined)
       |SELECT d.doc_id, d.lang, r.rate_ppm
       |FROM documents d JOIN rates r USING (lang)
       |WHERE ('0x' || substr(md5('rw:' || doc_id::VARCHAR), 1, 8))::BIGINT % 1000000
       |      < r.rate_ppm
       |ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------- t_scrub

  /** Denylist terms masked out of the corpus (word-boundary matches). */
  private val Denylist = Seq("hash", "spark", "win")
  private val ScrubPattern = Denylist.mkString("\\b(", "|", ")\\b")
  private val Mask = "[TERM]"

  /** Denylist scrubbing: mask every word-boundary occurrence of a
    * denylisted term and report the per-doc redaction count — the
    * content-policy pass of a curation pipeline (the same plumbing
    * serves PII patterns: swap the alternation for email/phone
    * regexes). Narrow per-row regex work, no shuffle; the pattern
    * stays in the \\b(...|...)\\b subset that Java regex and RE2
    * interpret identically, so the oracle runs the same scrub. */
  def tScrub(spark: SparkSession, dir: String): DataFrame = {
    val d = TextAnalysis.docsSpread(spark, dir)
    d.select(
        col("doc_id"),
        regexp_count(col("text"), lit(ScrubPattern)).cast("long").as("n_redacted"),
        regexp_replace(col("text"), ScrubPattern, Mask).as("scrubbed"))
      .orderBy("doc_id")
  }

  val tScrubSql: String =
    s"""SELECT doc_id,
       |  len(regexp_extract_all(text, '$ScrubPattern'))::BIGINT AS n_redacted,
       |  regexp_replace(text, '$ScrubPattern', '$Mask', 'g') AS scrubbed
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------- d_curate

  /** Minimum blended quality score for a doc to survive curation. */
  private val QualityTau = 0.7

  /** The composed end-to-end curation pipeline: a doc survives iff it
    * (1) scores ≥ τ on the blended quality metric, (2) language-IDs to
    * a known language, (3) is the keeper of its exact-duplicate group
    * (min doc_id per content fingerprint), and (4) is not a non-keeper
    * of a MinHash near-dup cluster. Steps 1–2 are narrow maps; step 3
    * is one hash shuffle on the fingerprint; step 4 reuses the
    * clustering operator and anti-joins its (small) non-keeper set —
    * the full pipeline adds exactly one shuffle beyond its parts. */
  def dCurate(spark: SparkSession, dir: String): DataFrame = {
    val d = TextAnalysis.docsSpread(spark, dir)
    // The checkpoint is a BARRIER, not a cache-for-reuse: without it
    // Catalyst pushes the quality/lang filters below the join and
    // inlines the full regex-heavy score expressions into both the
    // Filter and the output Project — every score evaluates twice
    // (measured 4.8s → 1.3s at sf0.1). ONE corpus pass computes the
    // three narrow rules (quality score, predicted language, content
    // fingerprint — each the identical expression its standalone
    // operator evaluates; the d_audit one-pass discipline), so the
    // materialized artifact is one narrow per-doc frame instead of a
    // checkpointed scan per rule.
    val perDoc = d.select(col("doc_id"),
        TextAnalysis.qualityScoreCol,
        graft.functions.TextFunctions.langId(col("text")).as("pred_lang"),
        md5(normText(col("text"))).as("content_fp"))
      .localCheckpoint()
    val clusterDups = Dedup.clusterLabels(spark, dir)
      .filter(!col("is_keeper")).select("doc_id")
    perDoc
      .filter(col("quality") >= QualityTau && col("pred_lang") =!= "und")
      .join(exactDupIdsFromFp(perDoc.select("doc_id", "content_fp")),
        Seq("doc_id"), "left_anti")
      .join(clusterDups, Seq("doc_id"), "left_anti")
      .select("doc_id", "pred_lang", "quality")
      .orderBy("doc_id")
  }

  /** d_audit — curation PROVENANCE: for every document, whether the
    * composed pipeline keeps it and, if not, the FIRST rule (in
    * precedence order: exact_dup → near_dup → low_quality → lang_und
    * → blocked_domain) that drops it — the "why was my document
    * removed" report data governance demands of a production
    * curation pass, and the per-rule attrition accounting mixture
    * design reads. PII is flagged (`pii_scrubbed`), not dropped —
    * kept documents with detected PII go to the scrub pass, matching
    * [[Pii.tPii]]'s semantics.
    *
    * Shape: every rule input is the SAME narrow (doc_id, flag) frame
    * its standalone operator produces ([[TextAnalysis.qualityMetrics]]
    * checkpointed exactly as [[dCurate]] does, the cluster labels,
    * the blocklist verdicts, the PII counts), met by doc_id
    * equi-joins — the audit costs the union of its rules' narrow
    * frames plus id-keyed joins, never another corpus pass per rule.
    * The precedence CASE is spelled identically in the oracle. */
  /** Exact-duplicate doc_ids: every doc whose content fingerprint has
    * a smaller-id twin. ONE definition of the fingerprint + keeper
    * rule shared by [[dCurate]] (as an anti-join) and [[dAudit]] (as
    * a flag) — the two operators' dedup decisions, and the
    * PipelineSpec invariant tying them, cannot drift apart. */
  private def exactDupIds(d: DataFrame): DataFrame =
    exactDupIdsFromFp(
      d.select(col("doc_id"), md5(normText(col("text"))).as("content_fp")))

  /** The keeper rule over an already-computed (doc_id, content_fp)
    * frame — [[auditWithInputs]] feeds it from the one-pass rule
    * frame's fingerprint column instead of re-scanning the corpus. */
  private def exactDupIdsFromFp(fp: DataFrame): DataFrame = {
    val rep = fp.groupBy("content_fp").agg(min("doc_id").as("rep_id"))
    fp.join(rep, "content_fp")
      .filter(col("doc_id") > col("rep_id"))
      .select("doc_id")
  }

  /** The SQL twin of [[exactDupIds]] — CTE chain yielding `xd(doc_id)`. */
  private val exactDupSqlCte: String =
    s"""fp AS (SELECT doc_id, md5($normSql) AS content_fp FROM documents),
       |xrep AS (SELECT content_fp, min(doc_id) AS rep_id FROM fp GROUP BY content_fp),
       |xd AS (SELECT fp.doc_id FROM fp JOIN xrep USING (content_fp)
       |       WHERE fp.doc_id > xrep.rep_id)""".stripMargin

  def dAudit(spark: SparkSession, dir: String): DataFrame =
    auditWithInputs(spark, dir)._1

  /** [[dAudit]] plus its two checkpointed corpus-pass inputs (quality
    * metrics incl. n_words, language predictions) — [[dDatacard]]
    * reuses them directly; localCheckpointed frames are invisible to
    * CacheManager, so re-deriving them there would run both corpus
    * scans twice. */
  private def auditWithInputs(spark: SparkSession,
      dir: String): (DataFrame, DataFrame, DataFrame) = {
    val d = TextAnalysis.docsSpread(spark, dir)
    // ONE corpus pass for every narrow per-doc rule: quality metrics,
    // language prediction, the pii flag (over the injected text) and
    // the exact-dup content fingerprint are each the IDENTICAL column
    // expression their standalone operator evaluates, but computed in
    // a single projection over a single scan (whole-stage codegen
    // CSE shares the normText regex chain between them) and
    // checkpointed once. The previous shape ran one checkpointed
    // corpus scan PER RULE — 4 scans, 4 normText evaluations, 4 jobs.
    // Only the rules that genuinely shuffle (near-dup clustering, the
    // fingerprint keeper groupBy) or read other columns (blocklist)
    // stay separate pipelines.
    val perDoc = d.select(
        col("doc_id") +: TextAnalysis.qualityCols ++: Seq(
          graft.functions.TextFunctions.langId(col("text")).as("pred_lang"),
          Pii.hasPiiCol(Pii.injectedText(col("doc_id"), col("text")))
            .as("has_pii"),
          md5(normText(col("text"))).as("content_fp")): _*)
      .localCheckpoint()
    val quality = perDoc.select("doc_id", "n_words", "quality")
    val lang = perDoc.select("doc_id", "pred_lang")
    val exactDup = exactDupIdsFromFp(
        perDoc.select(col("doc_id"), col("content_fp")))
      .withColumn("x_dup", lit(true))
    val nearDup = Dedup.clusterLabels(spark, dir)
      .filter(!col("is_keeper"))
      .select(col("doc_id"), lit(true).as("n_dup"))
    val blocked = WebCuration.dBlocklist(spark, dir)
      .select(col("doc_id"), col("blocked"))
    val pii = perDoc.select(col("doc_id"), col("has_pii"))
    val droppedBy = when(col("x_dup").isNotNull, "exact_dup")
      .when(col("n_dup").isNotNull, "near_dup")
      .when(col("quality") < QualityTau, "low_quality")
      .when(col("pred_lang") === "und", "lang_und")
      .when(col("blocked"), "blocked_domain")
    val audit = d.select(col("doc_id"))
      .join(exactDup, Seq("doc_id"), "left")
      .join(nearDup, Seq("doc_id"), "left")
      .join(quality, "doc_id")
      .join(lang, "doc_id")
      .join(blocked, "doc_id")
      .join(pii, "doc_id")
      .select(col("doc_id"), droppedBy.as("dropped_by"), col("has_pii"))
      .select(col("doc_id"), col("dropped_by").isNull.as("kept"),
        col("dropped_by"),
        (col("dropped_by").isNull && col("has_pii")).as("pii_scrubbed"))
      .orderBy("doc_id")
    (audit, quality, lang)
  }

  val dAuditSql: String =
    s"""WITH q AS (SELECT doc_id, quality FROM (${TextAnalysis.tQualitySql}) x),
       |l AS (SELECT doc_id, pred_lang FROM (${TextAnalysis.tLangIdSql}) x),
       |$exactDupSqlCte,
       |nd AS (SELECT doc_id FROM (${Dedup.dClusterSql}) c WHERE NOT is_keeper),
       |b AS (SELECT doc_id, blocked FROM (${WebCuration.dBlocklistSql}) x),
       |p AS (SELECT doc_id, has_pii FROM (${Pii.tPiiSql}) x),
       |verdict AS (
       |  SELECT d.doc_id,
       |    CASE WHEN d.doc_id IN (SELECT doc_id FROM xd) THEN 'exact_dup'
       |         WHEN d.doc_id IN (SELECT doc_id FROM nd) THEN 'near_dup'
       |         WHEN q.quality < $QualityTau THEN 'low_quality'
       |         WHEN l.pred_lang = 'und' THEN 'lang_und'
       |         WHEN b.blocked THEN 'blocked_domain'
       |         ELSE NULL END AS dropped_by,
       |    p.has_pii
       |  FROM documents d
       |  JOIN q USING (doc_id) JOIN l USING (doc_id)
       |  JOIN b USING (doc_id) JOIN p USING (doc_id))
       |SELECT doc_id, dropped_by IS NULL AS kept, dropped_by,
       |  (dropped_by IS NULL AND has_pii) AS pii_scrubbed
       |FROM verdict
       |ORDER BY doc_id""".stripMargin

  /** Sub-group fan-out of [[dDatacard]]'s hierarchical quality fold
    * (doc_id mod Subs — engine-mirrorable, planner-independent; the
    * [[graft.operators.Embeddings.CentroidSubs]] discipline). */
  val DatacardSubs = 32

  /** d_datacard — the per-source DATASET REPORT CARD every corpus
    * release ships (HuggingFace dataset cards, Dolma's summary
    * tables): one row per source with volume (docs, word tokens),
    * the curation outcome (kept count and rate from [[dAudit]]'s
    * verdicts), scrub load (kept-with-PII), language mix (modal
    * predicted language with a deterministic count-then-lexicographic
    * tie-break), and mean quality score. A composition over the SAME
    * narrow per-doc frames the standalone operators produce — the
    * card costs the audit plus id-keyed joins and ONE per-source
    * aggregation, never an extra corpus pass per metric.
    *
    * Parity: counts are integers; pct_kept is one int/int division;
    * mean_quality rides the [[graft.operators.Embeddings]]
    * HIERARCHICAL pinned fold (the e_centroid/e_gram discipline,
    * keyed (source, doc_id mod [[DatacardSubs]])): per-doc
    * stableRound(4) scores hash-shuffle once on the full key and
    * each sub-group folds STREAMING inside mapPartitions over the
    * sorted partition — no row ever holds a source's score list (a
    * per-source collect_list row is docs-per-source-sized: ~N/20
    * here, unbounded on a real corpus — the single-row shape this
    * repo engineered out of PageRank/t_jsd/e_centroid/d_shard); only
    * the ≤ sources × Subs partials materialize and the final combine
    * folds them in sub order. DuckDB mirrors the exact two-level
    * structure (per-sub sorted list_reduce, then sub-ordered
    * list_reduce), so every double is bit-identical — value-order
    * ties are harmless because equal addends produce the same
    * partial-sum sequence. The top-lang window runs over
    * (source, lang) COUNTS — a bounded grid, not corpus rows. */
  def dDatacard(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val src = Tables(spark, dir).documents.select(col("doc_id"), col("source"))
    // the audit's own checkpointed quality/lang frames ride along —
    // localCheckpoints are invisible to CacheManager, so re-deriving
    // them here would run both corpus scans a second time
    val (auditAll, q, lang) = auditWithInputs(spark, dir)
    val audit = auditAll.select("doc_id", "kept", "pii_scrubbed")
    val base = src.join(audit, "doc_id").join(q, "doc_id").join(lang, "doc_id")
      .localCheckpoint(false)
    val lc = base.groupBy("source", "pred_lang").agg(count(lit(1)).as("cnt"))
    val wTop = Window.partitionBy("source")
      .orderBy(col("cnt").desc, col("pred_lang"))
    val top = lc.withColumn("rk", row_number().over(wTop))
      .filter(col("rk") === 1)
      .select(col("source"), col("pred_lang").as("top_lang"),
        col("cnt").as("top_lang_n"))
    // hierarchical pinned quality sum: one exchange on the full
    // (source, sub) key, streaming per-group fold, bounded partials
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val subsums = base.select(col("source"),
        pmod(col("doc_id"), lit(DatacardSubs.toLong)).cast("int").as("sub"),
        col("quality").as("v"))
      .repartition(parts, col("source"), col("sub"))
      .sortWithinPartitions(col("source"), col("sub"), col("v"))
      .as[(String, Int, Double)]
      .mapPartitions { rows =>
        // groups are contiguous after the sort; stream one fold each
        val out = Seq.newBuilder[(String, Int, Double)]
        var cur: (String, Int) = null
        var s = 0.0
        def flush(): Unit = if (cur != null) out += ((cur._1, cur._2, s))
        rows.foreach { case (src, sub, v) =>
          val k = (src, sub)
          if (k != cur) { flush(); cur = k; s = 0.0 }
          s += v
        }
        flush()
        out.result().iterator
      }
      .toDF("source", "sub", "s")
    val qsum = subsums.groupBy("source")
      .agg(sort_array(collect_list(struct(col("sub"), col("s")))).as("ss"))
      .select(col("source"),
        graft.functions.expr.FoldExpressions.sumArrayField(col("ss"), "s").as("qsum"))
    base.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").cast("long").as("n_tokens"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("pii_scrubbed"), 1L).otherwise(0L)).as("n_pii_scrub"))
      .join(top, "source")
      .join(qsum, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_kept"),
        stableRound(col("n_kept").cast("double") /
          col("n_docs").cast("double"), 4).as("pct_kept"),
        col("n_pii_scrub"), col("top_lang"), col("top_lang_n"),
        stableRound(col("qsum") / col("n_docs"), 4).as("mean_quality"))
      .orderBy("source")
  }

  val dDatacardSql: String =
    s"""WITH a AS (SELECT doc_id, kept, pii_scrubbed FROM ($dAuditSql) x),
       |dq AS (SELECT doc_id, n_words, quality FROM (${TextAnalysis.tQualitySql}) x),
       |dl AS (SELECT doc_id, pred_lang FROM (${TextAnalysis.tLangIdSql}) x),
       |base AS (
       |  SELECT d.doc_id, d.source, a.kept, a.pii_scrubbed, dq.n_words,
       |    dq.quality, dl.pred_lang
       |  FROM documents d JOIN a USING (doc_id)
       |    JOIN dq USING (doc_id) JOIN dl USING (doc_id)),
       |lc AS (SELECT source, pred_lang, count(*)::BIGINT AS cnt
       |       FROM base GROUP BY 1, 2),
       |top AS (
       |  SELECT source, pred_lang AS top_lang, cnt AS top_lang_n
       |  FROM (SELECT *, row_number() OVER (PARTITION BY source
       |          ORDER BY cnt DESC, pred_lang) AS rk FROM lc) t
       |  WHERE rk = 1),
       |qsub AS (
       |  SELECT source, doc_id % $DatacardSubs AS sub,
       |    list_reduce(list_prepend(0.0, list(quality ORDER BY quality)),
       |      (x, y) -> x + y) AS s
       |  FROM base GROUP BY 1, 2),
       |qs AS (
       |  SELECT source,
       |    list_reduce(list_prepend(0.0, list(s ORDER BY sub)),
       |      (x, y) -> x + y) AS qsum
       |  FROM qsub GROUP BY 1),
       |agg AS (
       |  SELECT source, count(*)::BIGINT AS n_docs,
       |    sum(n_words)::BIGINT AS n_tokens,
       |    sum(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       |    sum(CASE WHEN pii_scrubbed THEN 1 ELSE 0 END)::BIGINT AS n_pii_scrub
       |  FROM base GROUP BY 1)
       |SELECT agg.source, n_docs, n_tokens, n_kept,
       |  ${stableRoundSql("n_kept::DOUBLE / n_docs::DOUBLE", 4)} AS pct_kept,
       |  n_pii_scrub, top_lang, top_lang_n,
       |  ${stableRoundSql("qsum / n_docs", 4)} AS mean_quality
       |FROM agg JOIN top USING (source) JOIN qs USING (source)
       |ORDER BY source""".stripMargin

  val dCurateSql: String =
    s"""WITH q AS (SELECT doc_id, quality FROM (${TextAnalysis.tQualitySql}) x),
       |l AS (SELECT doc_id, pred_lang FROM (${TextAnalysis.tLangIdSql}) x),
       |$exactDupSqlCte,
       |cluster_dups AS (
       |  SELECT doc_id FROM (${Dedup.dClusterSql}) c WHERE NOT is_keeper)
       |SELECT q.doc_id, l.pred_lang, q.quality
       |FROM q
       |JOIN l USING (doc_id)
       |WHERE q.quality >= $QualityTau AND l.pred_lang <> 'und'
       |  AND q.doc_id NOT IN (SELECT doc_id FROM xd)
       |  AND q.doc_id NOT IN (SELECT doc_id FROM cluster_dups)
       |ORDER BY doc_id""".stripMargin

  /** Mixture repeat factors per source for d_mix (whole epochs +
    * fractional basis points, split so the decision is integer-exact);
    * unlisted sources repeat [[MixDefaultWeight]] times. */
  private val MixWeights: Seq[(String, Double)] =
    Seq("src0" -> 2.5, "src1" -> 1.5, "src2" -> 0.5)
  private val MixDefaultWeight = 1.0

  /** d_mix — deterministic mixture oversampling: repeat each document
    * ⌊w⌋ times (w = its source's mixture weight), plus one more epoch
    * when a salted-md5 draw lands under w's fractional part — the
    * pretraining data-mixing step that up-/down-weights sources by a
    * FRACTIONAL factor (w < 1 downsamples, w > 1 duplicates across
    * epochs) while staying bit-reproducible run to run.
    *
    * Scale shape: entirely narrow — the weight lookup is a literal
    * CASE chain, the draw is md5 arithmetic on doc_id, and the epoch
    * rows come from exploding sequence(1, reps) at the scan site, so
    * amplification happens distributed, with no shuffle before the
    * presentation sort. The fractional decision compares integer basis
    * points (kk < frac·10⁴ with both sides exact ints), never floats.
    * Spark's sequence(1, 0) would yield [1, 0] (it infers a NEGATIVE
    * step when start > stop), so reps = 0 rows are filtered BEFORE the
    * explode — DuckDB's generate_series(1, 0) is empty and needs no
    * filter, which the oracle mirrors by construction. */
  def dMix(spark: SparkSession, dir: String): DataFrame = {
    val kk = conv(substring(md5(concat(lit("mix:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
      .cast("long") % 10000
    val whole = MixWeights.foldRight(
        lit(math.floor(MixDefaultWeight).toInt): org.apache.spark.sql.Column) {
      case ((s, w), acc) => when(col("source") === s, lit(math.floor(w).toInt)).otherwise(acc)
    }
    val fracBp = MixWeights.foldRight(
        lit((math.rint(MixDefaultWeight * 10000) % 10000).toInt): org.apache.spark.sql.Column) {
      case ((s, w), acc) =>
        when(col("source") === s, lit((math.rint(w * 10000) % 10000).toInt)).otherwise(acc)
    }
    Tables(spark, dir).documents
      .withColumn("reps", whole + when(kk < fracBp, 1).otherwise(0))
      .filter(col("reps") >= 1)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1), col("reps"))).as("ep"))
      .select(col("doc_id"), col("source"), col("ep").cast("long").as("epoch"))
      .orderBy("doc_id", "epoch")
  }

  val dMixSql: String = {
    def caseChain(f: Double => Long, dflt: Double): String = MixWeights
      .map { case (s, w) => s"WHEN source = '$s' THEN ${f(w)}" }
      .mkString("CASE ", " ", s" ELSE ${f(dflt)} END")
    val whole = caseChain(w => math.floor(w).toLong, MixDefaultWeight)
    val fracBp = caseChain(w => (math.rint(w * 10000) % 10000).toLong, MixDefaultWeight)
    s"""SELECT doc_id, source, unnest(generate_series(1, reps)) AS epoch
       |FROM (SELECT doc_id, source,
       |        ($whole) + (CASE WHEN ('0x' || substr(md5('mix:' || doc_id::VARCHAR), 1, 8))::BIGINT % 10000
       |                         < ($fracBp) THEN 1 ELSE 0 END) AS reps
       |      FROM documents)
       |ORDER BY doc_id, epoch""".stripMargin
  }

  /** [[dMixPlan]]'s target mixture, in basis points of 10000: named
    * sources get explicit shares, every other source splits the
    * remainder evenly. Repeat factors above [[MixPlanMaxRepeat]] cap
    * (a tiny prized source must not be duplicated unboundedly —
    * epoching past ~4 repeats measurably degrades models). */
  val MixPlanTargetsBps: Seq[(String, Int)] =
    Seq("src0" -> 1500, "src1" -> 1000, "src2" -> 500)
  val MixPlanMaxRepeat = 4.0

  /** d_mix_plan — the mixture PLANNING step upstream of [[dMix]]:
    * given target per-source token shares and the corpus's measured
    * token counts, the per-source repeat factor w_s = target_s ·
    * T / tokens_s that realizes the target, with the cap applied and
    * the expected post-mix token count — the table a pretraining run
    * reviews before burning compute on the actual mix ([[dMix]] then
    * EXECUTES repeat factors; this derives them from a target).
    *
    * Shape: one map-side-combined per-source token aggregation (the
    * only corpus-sized exchange) + a 1-row broadcast of (total,
    * unnamed-source count) — source-catalog-sized output, any scale.
    *
    * Parity: token counts are integers; target shares are exact
    * integer-over-integer divisions (named: bps/10⁴; others: the
    * remainder split over the DATA-derived unnamed-source count);
    * nat_share/repeat factors are single correctly-rounded double
    * expressions spelled identically in both engines, rounded once;
    * the cap compares already-rounded doubles and expected_tokens is
    * floor(w·n + 0.5) on those — integer-exact either side. */
  def dMixPlan(spark: SparkSession, dir: String): DataFrame = {
    val named = MixPlanTargetsBps.map(_._1)
    val othersBps = 10000 - MixPlanTargetsBps.map(_._2).sum
    val toks = TextAnalysis.docsSpread(spark, dir)
      .select(col("source"), size(words(col("text"))).cast("long").as("w"))
      .groupBy("source").agg(sum("w").as("n_tokens"))
    val totals = toks.agg(sum("n_tokens").cast("long").as("t_total"),
      sum(when(!col("source").isInCollection(named), 1L).otherwise(0L))
        .cast("long").as("n_other"))
    val tgt = MixPlanTargetsBps.foldRight(
        lit(othersBps).cast("double") /
          (lit(10000.0) * col("n_other").cast("double"))) {
      case ((s, bps), acc) =>
        when(col("source") === s, lit(bps).cast("double") / lit(10000.0))
          .otherwise(acc)
    }
    toks.crossJoin(broadcast(totals))
      .select(col("source"), col("n_tokens"),
        stableRound(col("n_tokens").cast("double") /
          col("t_total").cast("double"), 6).as("nat_share"),
        stableRound(tgt, 6).as("target_share"),
        stableRound(tgt * col("t_total").cast("double") /
          col("n_tokens").cast("double"), 4).as("repeat_raw"))
      .select(col("source"), col("n_tokens"), col("nat_share"),
        col("target_share"), col("repeat_raw"),
        least(col("repeat_raw"), lit(MixPlanMaxRepeat)).as("repeat_factor"),
        (col("repeat_raw") > MixPlanMaxRepeat).as("capped"))
      .withColumn("expected_tokens",
        floor(col("repeat_factor") * col("n_tokens").cast("double") + lit(0.5))
          .cast("long"))
      .orderBy("source")
  }

  val dMixPlanSql: String = {
    val named = MixPlanTargetsBps.map { case (s, _) => s"'$s'" }.mkString(", ")
    val othersBps = 10000 - MixPlanTargetsBps.map(_._2).sum
    val tgtCase = MixPlanTargetsBps
      .map { case (s, bps) => s"WHEN source = '$s' THEN $bps::DOUBLE / 10000.0" }
      .mkString("CASE ", " ",
        s" ELSE $othersBps::DOUBLE / (10000.0 * n_other::DOUBLE) END")
    s"""WITH toks AS (
       |  SELECT source, sum(len(string_split($normSql, ' ')))::BIGINT AS n_tokens
       |  FROM documents GROUP BY 1),
       |tot AS (
       |  SELECT sum(n_tokens)::BIGINT AS t_total,
       |    sum(CASE WHEN source NOT IN ($named) THEN 1 ELSE 0 END)::BIGINT AS n_other
       |  FROM toks),
       |p AS (
       |  SELECT source, n_tokens,
       |    ${stableRoundSql("n_tokens::DOUBLE / t_total::DOUBLE", 6)} AS nat_share,
       |    ${stableRoundSql(s"($tgtCase)", 6)} AS target_share,
       |    ${stableRoundSql(
              s"($tgtCase) * t_total::DOUBLE / n_tokens::DOUBLE", 4)} AS repeat_raw
       |  FROM toks CROSS JOIN tot)
       |SELECT source, n_tokens, nat_share, target_share, repeat_raw,
       |  least(repeat_raw, $MixPlanMaxRepeat) AS repeat_factor,
       |  repeat_raw > $MixPlanMaxRepeat AS capped,
       |  floor(least(repeat_raw, $MixPlanMaxRepeat) * n_tokens::DOUBLE + 0.5)::BIGINT
       |    AS expected_tokens
       |FROM p
       |ORDER BY source""".stripMargin
  }

  /** Sample size for d_weighted_sample. */
  val WeightedSampleK = 50

  /** d_weighted_sample — deterministic weighted sampling WITHOUT
    * replacement (the Efraimidis–Spirakis exponential-keys method):
    * each doc draws a salted-md5 uniform u = (kk+1)/10001 ∈ (0,1] and
    * ranks by ln(u)/w with w = its word-token count; the global
    * top-[[WeightedSampleK]] keys are the sample. Inclusion
    * probability is proportional to weight, the draw is hash-
    * deterministic (same doc, same decision, any partitioning), and
    * removal-without-replacement falls out of the top-k — the
    * length-proportional corpus subsample a token-budgeted pipeline
    * wants, where uniform doc sampling skews toward short docs.
    *
    * Parity: u is the same exact rational in both engines and the
    * rank runs on stableRound(ln(u)/w, 9) with doc_id tie-break — the
    * round-before-order discipline (libm ln differs by ~1 ulp
    * cross-engine; five-orders slack at scale 9, same class as the
    * other ln-ranked operators). Scale: the key is a narrow per-row
    * expression; the global top-k plans as TakeOrderedAndProject
    * (per-partition heaps, no global sort — plan-asserted). */
  def dWeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val kk = conv(substring(md5(concat(lit("wsmp:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
      .cast("long") % 10000
    TextAnalysis.docsSpread(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(split(normText(col("text")), " ")).cast("long").as("w_tokens"),
        ((kk + 1) / lit(10001.0)).as("u"))
      .withColumn("skey", stableRound(log(col("u")) / col("w_tokens"), 9))
      .orderBy(col("skey").desc, col("doc_id"))
      .limit(WeightedSampleK)
      .select("doc_id", "lang", "w_tokens", "skey")
      .orderBy("doc_id")
  }

  val dWeightedSampleSql: String =
    s"""SELECT doc_id, lang, w_tokens, skey FROM (
       |  SELECT doc_id, lang, w_tokens,
       |    ${stableRoundSql("ln(u) / w_tokens", 9)} AS skey
       |  FROM (SELECT doc_id, lang,
       |          len(string_split($normSql, ' '))::BIGINT AS w_tokens,
       |          ((('0x' || substr(md5('wsmp:' || doc_id::VARCHAR), 1, 8))::BIGINT % 10000) + 1)
       |            / 10001.0 AS u
       |        FROM documents) raw
       |  ORDER BY skey DESC, doc_id
       |  LIMIT $WeightedSampleK) t
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------- d_dsir

  /** Hashed-feature buckets for the importance model. 1024 keeps both
    * distribution tables broadcast-trivial at any corpus size while
    * leaving bucket collisions rare on the synthetic vocabulary. */
  val DsirBuckets = 1024

  /** The target domain whose distribution raw docs are scored
    * against. */
  val DsirTargetLang = "en"

  /** d_dsir — data selection with importance resampling (DSIR, Xie et
    * al. 2023, arXiv:2302.03169): score every raw doc by how much more
    * likely its hashed-unigram bag is under the TARGET domain's
    * feature distribution than under the raw corpus's, then keep the
    * target-leaning docs. The standard cheap alternative to a learned
    * quality classifier when "quality" means "looks like this curated
    * subset" — here the target is the `en` slice, so the operator's
    * mechanics (two smoothed feature distributions, per-doc
    * log-likelihood ratio) are exercised end-to-end on data the oracle
    * can replay.
    *
    * weight(d) = Σ_f n_f(d)·[ln p̂_t(f) − ln p̂_r(f)] / n_words(d),
    * with add-one smoothing over the [[DsirBuckets]]-bucket domain.
    * selected = weight > baseline, where baseline = Σ_f p̂_r(f)·lr(f)
    * = −KL(p̂_r‖p̂_t) is the expected weight of a raw-average token
    * mix, computed exactly from the 1024-bucket table (smoothing gives
    * every PER-DOC weight a negative bias of about this constant — a
    * ">0" test selects nothing; "above the corpus baseline" is the
    * calibration-free discriminator). A per-row decision against a
    * broadcast scalar, NOT a global rank: the published method samples
    * ~K docs via Gumbel noise on the weight; the deterministic engine
    * keeps the weight column (so a caller can [[dWeightedSample]] on
    * it) and pins the reproducible baseline test.
    *
    * Distribution: one corpus-keyed aggregation to (doc, bucket)
    * counts (map-side combined, bucket domain ≤ 1024 per doc); BOTH
    * distribution tables are ≤ 1024 rows (built from the cached
    * feature frame — vocabulary-sized input, bucket-sized output) and
    * broadcast back; the per-doc fold is a second keyed aggregation.
    * No join ever carries more than the feature frame. At 100 TB: two
    * linear keyed shuffles, two broadcast tables, nothing else.
    *
    * Float parity: counts and totals are exact integers; each bucket's
    * log-ratio runs the identical ÷/ln/− chain in both engines (ln is
    * 1-ulp engine-dependent — absorbed by the final [[stableRound]],
    * the [[TextAnalysis.tLogprob]] residual-risk discipline), and the
    * per-doc terms fold in sorted order. */
  def dDsir(spark: SparkSession, dir: String): DataFrame = {
    // Deliberately ONE aggregation with md5 per token instance: a
    // two-level (doc, word)-then-(doc, f) shape was tried to amortize
    // the md5 over distinct words and measured 2.6× SLOWER (4.2 →
    // 10.9 s) — the second aggregation turns the cached frame into a
    // multi-stage AQE subtree whose consumers re-pay its stages, and
    // the md5 itself is cheap next to that.
    val feats = TextAnalysis.docsSpread(spark, dir)
      .select(col("doc_id"), col("lang"), explode(words(col("text"))).as("word"))
      .select(col("doc_id"), col("lang"), (md5_32(col("word")) % DsirBuckets).as("f"))
      .groupBy("doc_id", "lang", "f").agg(count(lit(1)).as("n"))
      .cache()
    val raw = feats.groupBy("f").agg(sum("n").as("cr"))
    val tgt = feats.filter(col("lang") === DsirTargetLang)
      .groupBy("f").agg(sum("n").as("ct"))
    val totR = raw.agg(sum("cr").as("tr"))
    val totT = tgt.agg(sum("ct").as("tt"))
    val lr = raw.join(tgt, Seq("f"), "left")
      .crossJoin(broadcast(totR)).crossJoin(broadcast(totT))
      .select(col("f"),
        (log((coalesce(col("ct"), lit(0L)) + lit(1L)) / (col("tt") + lit(DsirBuckets.toLong))) -
          log((col("cr") + lit(1L)) / (col("tr") + lit(DsirBuckets.toLong)))).as("lr"))
    // the 1024-term baseline folds deterministically in sorted order
    // (one bounded-size aggregation — bucket domain is constant)
    val base = lr.join(raw, "f").crossJoin(broadcast(totR))
      .select(((col("cr") / col("tr")) * col("lr")).as("bterm"))
      .agg(sort_array(collect_list(col("bterm"))).as("bs"))
      .select(stableRound(
        graft.functions.expr.FoldExpressions.sumArray(col("bs")), 4).as("baseline"))
    feats.join(broadcast(lr), "f")
      .select(col("doc_id"), col("n"), (col("n") * col("lr")).as("term"))
      .groupBy("doc_id")
      .agg(sum("n").cast("long").as("n_words"),
        sort_array(collect_list(col("term"))).as("ts"))
      .select(col("doc_id"), col("n_words"),
        stableRound(graft.functions.expr.FoldExpressions.sumArray(col("ts"))
          / col("n_words"), 4).as("dsir_weight"))
      .crossJoin(broadcast(base))
      .withColumn("selected", col("dsir_weight") > col("baseline"))
      .orderBy("doc_id")
  }

  val dDsirSql: String =
    s"""WITH w AS (SELECT doc_id, lang, string_split($normSql, ' ') AS w FROM documents),
       |feats AS (
       |  SELECT doc_id, lang,
       |    ('0x' || substr(md5(word), 1, 8))::BIGINT % $DsirBuckets AS f,
       |    count(*) AS n
       |  FROM (SELECT doc_id, lang, unnest(w) AS word FROM w) u
       |  GROUP BY 1, 2, 3),
       |raw AS (SELECT f, sum(n) AS cr FROM feats GROUP BY 1),
       |tgt AS (SELECT f, sum(n) AS ct FROM feats WHERE lang = '$DsirTargetLang' GROUP BY 1),
       |tr AS (SELECT sum(cr) AS tr FROM raw),
       |tt AS (SELECT sum(ct) AS tt FROM tgt),
       |lr AS (
       |  SELECT raw.f,
       |    ln((coalesce(tgt.ct, 0) + 1) / (tt.tt + $DsirBuckets)) -
       |    ln((raw.cr + 1) / (tr.tr + $DsirBuckets)) AS lr
       |  FROM raw LEFT JOIN tgt USING (f) CROSS JOIN tr CROSS JOIN tt),
       |terms AS (
       |  SELECT feats.doc_id, feats.n, feats.n * lr.lr AS term
       |  FROM feats JOIN lr USING (f)),
       |g AS (
       |  SELECT doc_id, sum(n)::BIGINT AS n_words, list(term ORDER BY term) AS ts
       |  FROM terms GROUP BY doc_id),
       |base AS (
       |  SELECT ${stableRoundSql("list_reduce(list_prepend(0.0, list(bterm ORDER BY bterm)), (a, b) -> a + b)", 4)} AS baseline
       |  FROM (SELECT (raw.cr / tr.tr) * lr.lr AS bterm
       |        FROM lr JOIN raw USING (f) CROSS JOIN tr) b),
       |s AS (
       |  SELECT doc_id, n_words,
       |    ${stableRoundSql("list_reduce(list_prepend(0.0, ts), (a, b) -> a + b) / n_words", 4)} AS dsir_weight
       |  FROM g)
       |SELECT doc_id, n_words, dsir_weight, baseline, dsir_weight > baseline AS selected
       |FROM s CROSS JOIN base
       |ORDER BY doc_id""".stripMargin

  /** The two-pass distributed GLOBAL RANK shared by [[dOrder]] and
    * [[dPplBucket]] (the [[graft.operators.TextAnalysis.budgetPack]]
    * discipline applied to positions): range-partition `df` by
    * `sortExprs` (ONE exchange), pin the sampled range boundaries by
    * freezing the partitioned frame as a PER-CALL lazy localCheckpoint
    * (repartitionByRange SAMPLES — without a frozen materialization
    * the rank pass could see different boundaries than the count
    * pass; the earlier shared cache slot reintroduced the hazard
    * between two CONCURRENT calls of one operator, where call A's
    * release could evict the entry call B's count pass ran on — a
    * checkpoint RDD is per-call, immutable, and its blocks are
    * released by the ContextCleaner when the returned frame is
    * dropped), collect per-partition counts to the driver (parts
    * longs — bounded), then each partition emits dense positions from
    * its prefix offset — never a global ORDER BY window pulling the
    * corpus through one reducer. Returns (input columns + `pos`,
    * total row count); the output is ALREADY in global pos order
    * partition-wise (range partitioning + the local counter), and the
    * trailing in-partition sort lets consumers SEE that order without
    * an exchange (the round-7 review's catch — a full orderBy would
    * re-shuffle purely for presentation). Extracting this helper made
    * the pinning invariant STRUCTURAL for the rank call sites; the
    * prefix-sum variants ([[graft.operators.TextAnalysis.budgetPack]],
    * [[dBudget]]) still carry it by the documented convention. */
  private def rankPinned(spark: SparkSession, df: DataFrame,
      sortExprs: Seq[Column]): (DataFrame, Long) = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val pinned = df.repartitionByRange(parts, sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*)
      .localCheckpoint(false)
    val partCounts = pinned.mapPartitions(
      it => Iterator.single(it.size.toLong))(Encoders.scalaLong).collect()
    val offsets = partCounts.scanLeft(0L)(_ + _)
    val outSchema = StructType(
      pinned.schema.fields :+ StructField("pos", LongType, nullable = false))
    val ranked = pinned.withColumn("pid", spark_partition_id())
      .mapPartitions { it =>
        var run = 0L
        it.map { r =>
          val pos = offsets(r.getInt(r.length - 1)) + run
          run += 1L
          Row.fromSeq(r.toSeq.dropRight(1) :+ pos)
        }
      }(Encoders.row(outSchema))
      .sortWithinPartitions("pos")
    (ranked, offsets.last)
  }

  /** d_order — deterministic global TRAINING ORDER: every document
    * ranked by a salted md5 of its id (the shuffle-before-training
    * step every epoch pipeline runs; deterministic, so any worker —
    * or a re-run — reproduces the same order with no shuffle files
    * to keep), through the shared [[rankPinned]] two-pass rank.
    *
    * Output: (doc_id, shuffle_key, pos) — pos is a dense permutation
    * 0..n-1 in (shuffle_key, doc_id) order, identical at any
    * partition count (spec-pinned) and identical in DuckDB (md5 hex
    * is ASCII, so string order ≡ binary order in both engines). */
  def dOrder(spark: SparkSession, dir: String): DataFrame = {
    val keyed = Tables(spark, dir).documents
      .select(col("doc_id"),
        md5(concat(lit("ord:"), col("doc_id").cast("string"))).as("shuffle_key"))
    rankPinned(spark, keyed,
      Seq(col("shuffle_key"), col("doc_id")))._1
  }

  val dOrderSql: String =
    """SELECT doc_id, md5('ord:' || doc_id::VARCHAR) AS shuffle_key,
      |  (row_number() OVER (ORDER BY md5('ord:' || doc_id::VARCHAR), doc_id) - 1)::BIGINT AS pos
      |FROM documents
      |ORDER BY pos""".stripMargin

  /** Number of perplexity buckets (CCNet's head/middle/tail). */
  val PplBuckets = 3

  /** d_ppl_bucket — CCNet-style perplexity bucketing: every document
    * ranked by its LM score ([[graft.operators.TextAnalysis.logprobScored]]'s
    * unigram logprob — the cheap perplexity proxy; a real pipeline
    * swaps in a KenLM score without touching the ranking) and split
    * into head / middle / tail terciles, best-scoring docs first —
    * the quality tiers CCNet samples from when composing a pretraining
    * mix (head kept, middle sampled, tail dropped or down-weighted).
    *
    * The global rank is the shared [[rankPinned]] two-pass discipline
    * applied to a SCORE key: range-partition by (logprob10 DESC,
    * doc_id), per-partition counts, prefix-offset positions — never a
    * global ORDER BY window pulling the corpus through one reducer;
    * at 100 TB the range sampler sees the score distribution exactly
    * like any sort. Bucket = ⌊pos·K/N⌋ + 1 (0-based pos), integer
    * arithmetic only — provably ntile(K) semantics (first N mod K
    * buckets take the extra row), which is what the oracle replays.
    * Ordering parity: logprob10 is the stableRound(4) score
    * (bit-identical doubles in both engines), ties broken by doc_id. */
  def dPplBucket(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.logprobScored(spark, dir)
      .select(col("doc_id"), col("logprob10"))
    val (ranked, total) = rankPinned(spark, scored,
      Seq(col("logprob10").desc, col("doc_id")))
    val n = math.max(total, 1L)
    ranked
      .withColumn("bucket_idx",
        expr(s"pos * $PplBuckets div $n + 1").cast("long"))
      .withColumn("bucket",
        when(col("bucket_idx") === 1L, "head")
          .when(col("bucket_idx") === 2L, "middle")
          .otherwise("tail"))
      .select("doc_id", "logprob10", "bucket_idx", "bucket")
      .orderBy("doc_id")
  }

  val dPplBucketSql: String =
    s"""${TextAnalysis.logprobCoreSql}
       |SELECT doc_id, logprob10,
       |  ntile($PplBuckets) OVER (ORDER BY logprob10 DESC, doc_id)::BIGINT AS bucket_idx,
       |  CASE ntile($PplBuckets) OVER (ORDER BY logprob10 DESC, doc_id)
       |    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
       |FROM s
       |ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d_ppl_bucket" -> dPplBucket,
    "d_order" -> dOrder,
    "d_sample" -> dSample,
    "d_dsir" -> dDsir,
    "d_budget" -> dBudget,
    "d_shard" -> dShard,
    "d_reweight" -> dReweight,
    "t_scrub" -> tScrub,
    "d_curate" -> dCurate,
    "d_audit" -> dAudit,
    "d_datacard" -> dDatacard,
    "d_mix" -> dMix,
    "d_mix_plan" -> dMixPlan,
    "d_weighted_sample" -> dWeightedSample,
  )

  def oracles: Map[String, String] = Map(
    "d_ppl_bucket" -> dPplBucketSql,
    "d_order" -> dOrderSql,
    "d_sample" -> dSampleSql,
    "d_dsir" -> dDsirSql,
    "d_budget" -> dBudgetSql,
    "d_shard" -> dShardSql,
    "d_reweight" -> dReweightSql,
    "t_scrub" -> tScrubSql,
    "d_curate" -> dCurateSql,
    "d_audit" -> dAuditSql,
    "d_datacard" -> dDatacardSql,
    "d_mix" -> dMixSql,
    "d_mix_plan" -> dMixPlanSql,
    "d_weighted_sample" -> dWeightedSampleSql,
  )
}
