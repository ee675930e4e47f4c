package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, Events, Similarity, TextAnalysis}

/** Semantics checks for the LLM-pipeline operators (the driver's
  * DuckDB oracle checks value parity; these check properties). */
class PipelineSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  /** Driver-side md5 hex — the engines' md5() replayed for independent
    * recomputes (shared by the lsh-gate, phash, and decontam tests). */
  private def md5Hex(v: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  test("dedup_exact: keeper is min id of its group and never a dup") {
    val df = Dedup.dDedupExact(spark, sf).cache()
    assert(df.filter(col("doc_id") === col("keeper_id") && col("is_dup")).count() == 0)
    assert(df.filter(col("keeper_id") > col("doc_id")).count() == 0)
  }

  test("dedup_ngram: pairs are ordered, jaccard within (0,1]") {
    val df = Dedup.dDedupNgram(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("id1") >= col("id2")).count() == 0)
    assert(df.filter(col("jaccard") <= 0 || col("jaccard") > 1).count() == 0)
  }

  test("ngram prefix filtering is result-preserving vs the full inverted index") {
    // Naive reference: candidates from the UNFILTERED posting
    // self-join, verified with the same exact Jaccard — the pair set
    // prefix filtering must reproduce exactly (it prunes the plan,
    // never the result).
    def naive(dir: String) = {
      val d = graft.core.Tables(SparkSpec.spark, dir).documents
      val sets = d.select(col("doc_id"),
          graft.functions.expr.VectorExpressions.wordShingles(
            graft.functions.TextFunctions.words(col("text")), 3).as("shing"))
        .filter(size(col("shing")) > 0)
        .select(col("doc_id"), array_distinct(expr(
          "transform(shing, s -> cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint))")).as("hs"))
      val posts = sets.select(col("doc_id"), explode(col("hs")).as("h"))
      val cand = posts.as("a").join(posts.as("b"), "h")
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .dropDuplicates("id1", "id2")
      cand.join(sets.select(col("doc_id").as("id1"), col("hs").as("s1")), "id1")
        .join(sets.select(col("doc_id").as("id2"), col("hs").as("s2")), "id2")
        .withColumn("inter", size(array_intersect(col("s1"), col("s2"))).cast("long"))
        .withColumn("jaccard",
          round(col("inter") / (size(col("s1")) + size(col("s2")) - col("inter")), 6))
        .filter(col("jaccard") >= Dedup.JaccardTau)
        .select("id1", "id2")
    }
    Seq(sf, "/root/testdata/sf0.01").foreach { dir =>
      val filtered = Dedup.dDedupNgram(SparkSpec.spark, dir).select("id1", "id2")
      val full = naive(dir)
      assert(filtered.exceptAll(full).count() == 0 &&
        full.exceptAll(filtered).count() == 0,
        s"prefix-filtered pair set diverges from the full index at $dir")
    }
  }

  test("ngram df-ascending prefix order is result-identical to the hash order") {
    // graft.ngram.prefixOrder picks a PLAN (which ℓ tokens each doc
    // indexes), never an answer: the AllPairs prefix theorem holds for
    // any global total order, so the verified pair set must be
    // bit-identical under both orders.
    val hashOrder = Dedup.dDedupNgram(spark, sf).cache()
    spark.conf.set("graft.ngram.prefixOrder", "df")
    try {
      val dfOrder = Dedup.dDedupNgram(spark, sf)
      assert(hashOrder.exceptAll(dfOrder).count() == 0 &&
        dfOrder.exceptAll(hashOrder).count() == 0,
        "prefix order changed the verified pair set")
      assert(hashOrder.count() > 0)
    } finally spark.conf.unset("graft.ngram.prefixOrder")
  }

  test("dedup_minhash: candidates are a subset of true near-dup pairs") {
    val mh = Dedup.dDedupMinhash(spark, sf).select("id1", "id2")
    val ng = Dedup.dDedupNgram(spark, sf).select("id1", "id2")
    // LSH verification uses the same Jaccard τ, so minhash ⊆ ngram
    assert(mh.join(ng, Seq("id1", "id2"), "left_anti").count() == 0)
    assert(mh.count() > 0)
  }

  test("d_dedup_chunk reports only repeated chunks, keeper is the min occurrence") {
    val chunks = Dedup.dDedupChunk(spark, sf).cache()
    assert(chunks.count() > 0, "fixture lost: no duplicated 16-word chunk in the corpus")
    assert(chunks.filter(col("n_occ") < 2).count() == 0)
    assert(chunks.filter(col("n_docs") > col("n_occ")).count() == 0)
    assert(chunks.filter(col("n_docs") > 1).count() > 0,
      "fixture lost: no chunk shared ACROSS documents")
    assert(chunks.filter(col("keeper_pos") < 0).count() == 0)
    // exact-dup docs share ALL their full chunks: every chunk of a doc
    // in an exact-dup group (normalized length ≥ 16 words) must appear
    // in the output with n_docs > 1 — a miss means chunking dropped or
    // privatized a chunk that verbatim-identical docs share
    val dupDocs = Dedup.dDedupExact(spark, sf)
      .filter(col("group_size") > 1).select("doc_id")
    val dupDocChunks = graft.core.Tables(spark, sf).documents
      .join(dupDocs, "doc_id")
      .select(explode(graft.functions.expr.VectorExpressions.wordChunks(
        graft.functions.TextFunctions.words(col("text")), Dedup.ChunkWords)).as("c"))
      .select(md5(col("c")).as("chunk_fp")).distinct()
    val missing = dupDocChunks
      .join(chunks.filter(col("n_docs") > 1), Seq("chunk_fp"), "left_anti").count()
    assert(missing == 0, s"$missing chunks of exact-dup docs not reported as cross-doc dups")
  }

  test("t_repetition fractions are bounded and the flag is the integer predicate") {
    val rep = TextAnalysis.tRepetition(spark, sf).cache()
    assert(rep.count() == graft.core.Tables(spark, sf).documents.count())
    Seq("dup_word_frac", "top_word_frac", "dup_2gram_frac").foreach { c =>
      assert(rep.filter(col(c) < 0 || col(c) > 1).count() == 0, s"$c out of [0,1]")
    }
    val flagged = rep.filter(col("repetitive")).count()
    assert(flagged > 0 && flagged < rep.count(),
      s"thresholds must split the corpus (flagged $flagged of ${rep.count()})")
  }

  test("t_entropy is bounded by log2(distinct words) and splits the corpus") {
    val ent = TextAnalysis.tEntropy(spark, sf).cache()
    assert(ent.count() == graft.core.Tables(spark, sf).documents.count())
    // 0 ≤ H ≤ log2(nd), with slack for the 4-decimal rounding
    assert(ent.filter(col("entropy_bits") < 0).count() == 0)
    assert(ent.filter(
      col("entropy_bits") > log(2.0, col("n_distinct_words")) + 0.0001).count() == 0)
    // single-word docs have exactly zero entropy
    assert(ent.filter(col("n_distinct_words") === 1 && col("entropy_bits") =!= 0.0)
      .count() == 0)
    val flagged = ent.filter(col("low_diversity")).count()
    assert(flagged > 0 && flagged < ent.count(),
      s"threshold must split the corpus (flagged $flagged of ${ent.count()})")
  }

  test("dedup_simhash: pairs symmetric-free and within hamming bound") {
    val df = Dedup.dDedupSimhash(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("hamming") > Dedup.HammingK).count() == 0)
  }

  test("ann_lsh recall vs brute force is at least 0.5") {
    val brute = Similarity.sAnnBrute(spark, sf).select("query_id", "neighbor_id")
    val lsh = Similarity.sAnnLsh(spark, sf).select("query_id", "neighbor_id")
    val hits = lsh.join(brute, Seq("query_id", "neighbor_id")).count()
    val total = brute.count()
    val recall = hits.toDouble / total
    // Deterministic on fixed data + seeded hyperplanes: 8 tables with
    // hamming-1 multi-probe recover ≥ half the true top-k even on this
    // near-uniform corpus (no high-similarity structure to exploit).
    assert(recall >= 0.5, s"LSH recall $recall ($hits of $total) below 0.5")
  }

  test("ann_sq8 two-tier recall vs brute force is at least 0.9") {
    val brute = Similarity.sAnnBrute(spark, sf).select("query_id", "neighbor_id")
    val sq8 = Similarity.sAnnSq8(spark, sf).select("query_id", "neighbor_id")
    val hits = sq8.join(brute, Seq("query_id", "neighbor_id")).count()
    val total = brute.count()
    // int8 coarse + exact rescore of 50 candidates: quantization has
    // to reorder the coarse top-50 boundary to lose a true top-10
    // neighbor — near-lossless on this corpus, unlike the LSH/IVF
    // bucketing variants
    assert(hits.toDouble / total >= 0.9,
      s"sq8 recall ${hits.toDouble / total} ($hits of $total) below 0.9")
  }

  test("ann_pq coarse+rescore recall vs brute force is at least 0.5") {
    val brute = Similarity.sAnnBrute(spark, sf).select("query_id", "neighbor_id")
    val pq = Similarity.sAnnPq(spark, sf).select("query_id", "neighbor_id")
    val hits = pq.join(brute, Seq("query_id", "neighbor_id")).count()
    val total = brute.count()
    val recall = hits.toDouble / total
    // 8-byte PQ codes + exact rescore of PqCandidates (100); the
    // Lloyd-refined codebook clears this floor with margin (the
    // measured curve lives in KmeansRecallSpec, which pins 0.7)
    assert(recall >= 0.5, s"PQ recall $recall ($hits of $total) below 0.5")
  }

  test("ann_ivfpq composed recall vs brute force is at least 0.5") {
    val brute = Similarity.sAnnBrute(spark, sf).select("query_id", "neighbor_id")
    val ivfpq = Similarity.sAnnIvfPq(spark, sf).select("query_id", "neighbor_id")
    val hits = ivfpq.join(brute, Seq("query_id", "neighbor_id")).count()
    val total = brute.count()
    val recall = hits.toDouble / total
    // the composition loses at most what its parts lose: cell pruning
    // (IVF bound) then ADC ordering over the cell survivors with a
    // 100-deep exact-rescore pool
    assert(recall >= 0.5, s"IVF-PQ recall $recall ($hits of $total) below 0.5")
  }

  test("ann_ivf recall vs brute force is at least 0.5") {
    val brute = Similarity.sAnnBrute(spark, sf).select("query_id", "neighbor_id")
    val ivf = Similarity.sAnnIvf(spark, sf).select("query_id", "neighbor_id")
    val hits = ivf.join(brute, Seq("query_id", "neighbor_id")).count()
    val total = brute.count()
    val recall = hits.toDouble / total
    assert(recall >= 0.5, s"IVF recall $recall ($hits of $total) below 0.5")
  }

  test("dedup clusters put every near-dup pair in one component") {
    val pairs = Dedup.dDedupMinhash(spark, sf).select("id1", "id2")
    val labels = Dedup.dCluster(spark, sf).select("doc_id", "cluster_id")
    val l1 = labels.withColumnRenamed("doc_id", "id1").withColumnRenamed("cluster_id", "c1")
    val l2 = labels.withColumnRenamed("doc_id", "id2").withColumnRenamed("cluster_id", "c2")
    val broken = pairs.join(l1, "id1").join(l2, "id2")
      .filter(col("c1") =!= col("c2")).count()
    assert(broken == 0, s"$broken pairs ended up in different clusters")
    // exactly one keeper per cluster, and it is the min id
    val keepers = Dedup.dCluster(spark, sf)
      .groupBy("cluster_id")
      .agg(min(col("doc_id")).as("lo"),
        sum(when(col("is_keeper"), 1).otherwise(0)).as("nk"))
    assert(keepers.filter(col("nk") =!= 1 || col("lo") =!= col("cluster_id")).count() == 0)
  }

  test("incremental clustering reproduces the full recompute exactly") {
    val full = Dedup.dCluster(spark, sf)
    val incr = Dedup.dClusterIncr(spark, sf)
    assert(incr.count() == full.count())
    assert(incr.exceptAll(full).count() == 0 && full.exceptAll(incr).count() == 0,
      "incremental labels diverge from the full recompute")
  }

  test("embedding dedup kernel and join formulations emit identical pairs") {
    val smj = Similarity.dDedupEmbedding(spark, sf)
    val kernel = Similarity.dDedupEmbeddingKernel(spark, sf)
    assert(smj.exceptAll(kernel).count() == 0 && kernel.exceptAll(smj).count() == 0,
      "block-kernel pair set diverges from the SMJ formulation")
    assert(kernel.count() > 0)
  }

  test("embedding kernel pair set is invariant across block counts") {
    val a = Similarity.dDedupEmbeddingKernelB(spark, sf, forceB = Some(3))
    val b = Similarity.dDedupEmbeddingKernelB(spark, sf, forceB = Some(7))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "pair set depends on the block count — blocking is leaking into semantics")
    assert(a.count() > 0)
  }

  test("knn graph is invariant across block counts, exact degree k, no self-edges") {
    import org.apache.spark.sql.functions._
    val a = Similarity.sKnnGraphB(spark, sf, forceB = Some(3))
    val b = Similarity.sKnnGraphB(spark, sf, forceB = Some(7))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "neighbor set depends on the block count — blocking is leaking into semantics")
    // every node has exactly k neighbors (n > k in every sf dir)
    val counts = a.groupBy("vec_id").count().select("count").distinct().collect()
    assert(counts.map(_.getLong(0)).toSet == Set(Similarity.KnnK.toLong),
      s"nodes with != k neighbors: ${counts.mkString(",")}")
    // a node must never neighbor itself — the failure mode of cutting
    // same-block pairs by list index instead of by id
    assert(a.filter(col("vec_id") === col("neighbor_id")).count() == 0,
      "self-edge found — same-block pair cut regressed to index-based")
  }

  test("embedding kernel block count respects the per-block row budget") {
    val n = graft.core.Tables(spark, sf).embeddings.count()
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val bDerived = Similarity.blockCount(n, parts)
    val rowsPerBlock = (n + bDerived - 1) / bDerived
    assert(rowsPerBlock <= Similarity.TargetRowsPerBlock,
      s"a block row would gather $rowsPerBlock vectors (budget ${Similarity.TargetRowsPerBlock})")
    // the budget must hold under growth, not just at test scale: a
    // 10⁹-vector corpus still caps each gathered block row
    val big = 1000000000L
    val bBig = Similarity.blockCount(big, parts)
    assert((big + bBig - 1) / bBig <= Similarity.TargetRowsPerBlock,
      "block count stops scaling with the corpus — the hardcoded-B failure mode")
    // and enough block pairs to occupy the cluster at small n
    assert(bDerived.toLong * (bDerived + 1) / 2 >= parts,
      s"only ${bDerived.toLong * (bDerived + 1) / 2} block pairs for $parts slots")
  }

  test("resizeStub fails loudly on non-ASCII payloads") {
    // byte striding ≡ the oracle's char striding only on ASCII; a
    // silent divergence is exactly what this guard exists to prevent
    val ok = graft.multimodal.Multimodal.resizeStub(1L, "abcdef".getBytes("UTF-8"))
    assert(ok.resized_bytes == 3L)
    val ex = intercept[IllegalArgumentException] {
      graft.multimodal.Multimodal.resizeStub(2L, "café".getBytes("UTF-8"))
    }
    assert(ex.getMessage.contains("non-ASCII"))
  }

  test("streaming queries never mutate the caller session's conf") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    graft.streaming.EventStream.stTopk(spark, sf).collect()
    assert(spark.conf.get(key) == before,
      "stream state-partition width leaked into the batch session")
  }

  test("d_sample is deterministic and downsamples the dominant language") {
    val s1 = Curation.dSample(spark, sf).cache()
    val s2 = Curation.dSample(spark, sf)
    assert(s1.exceptAll(s2).count() == 0 && s2.exceptAll(s1).count() == 0,
      "sample is not deterministic")
    val docs = graft.core.Tables(spark, sf).documents
    val enAll = docs.filter(col("lang") === "en").count()
    val enKept = s1.filter(col("lang") === "en").count()
    val zhAll = docs.filter(col("lang") === "zh").count()
    val zhKept = s1.filter(col("lang") === "zh").count()
    assert(zhKept == zhAll, "zh rate is 10000/10000 — every zh doc must survive")
    assert(enKept < enAll, "en must be downsampled")
  }

  test("d_decontaminate flags only train docs, consistently with the threshold") {
    val contam = Dedup.dDecontaminate(spark, sf).cache()
    assert(contam.count() > 0, "fixture lost: no train/test 8-gram overlap at all")
    assert(contam.filter(col("contaminated")).count() > 0,
      "fixture lost: no doc reaches the contamination threshold")
    // the flag is exactly the threshold predicate
    assert(contam.filter(
      col("contaminated") =!= (col("n_overlap") >= Dedup.ContamMinHits)).count() == 0)
    // every reported doc is in the train split (never validation/test)
    val splits = Dedup.dSplit(spark, sf)
    assert(contam.join(splits, "doc_id")
      .filter(col("split") =!= "train").count() == 0)
  }

  test("d_shard partitions the corpus into balanced deterministic shards") {
    val shards = Curation.dShard(spark, sf).cache()
    val total = graft.core.Tables(spark, sf).documents.count()
    assert(shards.agg(sum("n_docs")).head.getLong(0) == total,
      "shards must partition the corpus exactly")
    assert(shards.filter(col("shard") < 0 || col("shard") >= 16).count() == 0)
    // md5-uniform keys keep shards balanced (loose 3× bound on sf data)
    val sizes = shards.select("n_docs").as[Long].collect()
    assert(sizes.max <= 3 * math.max(sizes.min, 1),
      s"shard skew beyond bound: min=${sizes.min} max=${sizes.max}")
    // deterministic: same order fingerprints on recompute
    val again = Curation.dShard(spark, sf)
    assert(shards.exceptAll(again).count() == 0 && again.exceptAll(shards).count() == 0)
  }

  test("d_reweight never upsamples and keeps the binding language whole") {
    val kept = Curation.dReweight(spark, sf).cache()
    val docs = graft.core.Tables(spark, sf).documents
    val obs = docs.groupBy("lang").count().withColumnRenamed("count", "n_all")
    val per = kept.groupBy("lang", "rate_ppm").count().join(obs, "lang").cache()
    // rates are probabilities: 0 < ppm <= 1e6, and kept <= observed
    assert(per.filter(col("rate_ppm") <= 0 || col("rate_ppm") > 1000000).count() == 0)
    assert(per.filter(col("count") > col("n_all")).count() == 0)
    // at least one language is the binding constraint — rate 1.0 up
    // to the integer floor (T = floor(n·10⁴/bp) can shave ppm off an
    // exact 10⁶ when bp does not divide n·10⁴)
    assert(per.agg(max("rate_ppm")).head.getLong(0) >= 999000L,
      "no binding language — the mixture is not maximal")
    // only target-mix languages survive
    val langs = kept.select("lang").distinct().as[String].collect().toSet
    assert(langs.subsetOf(Set("en", "de", "es", "fr", "zh")))
  }

  test("t_scrub leaves no denylist term and counts every redaction") {
    val scrubbed = Curation.tScrub(spark, sf).cache()
    assert(scrubbed.filter(col("scrubbed").rlike("\\b(hash|spark|win)\\b")).count() == 0)
    assert(scrubbed.agg(sum("n_redacted")).head.getLong(0) > 0)
    // masking is count-preserving: n_redacted == occurrences of the mask
    assert(scrubbed.filter(
      col("n_redacted") =!=
        ((length(col("scrubbed")) - length(replace(col("scrubbed"), lit("[TERM]"), lit("")))) / 6)
    ).count() == 0)
  }

  test("d_curate output passes every individual filter") {
    val curated = Curation.dCurate(spark, sf).cache()
    assert(curated.count() > 0)
    assert(curated.filter(col("quality") < 0.7 || col("pred_lang") === "und").count() == 0)
    // no two curated docs share a content fingerprint
    val fps = curated.join(
      graft.core.Tables(spark, sf).documents.select(col("doc_id"),
        md5(graft.functions.TextFunctions.normText(col("text"))).as("fp")), "doc_id")
    assert(fps.groupBy("fp").count().filter(col("count") > 1).count() == 0)
    // no curated doc is a near-dup non-keeper
    val dups = Dedup.clusterLabels(spark, sf).filter(!col("is_keeper")).select("doc_id")
    assert(curated.join(dups, Seq("doc_id"), "left_semi").count() == 0)
  }

  test("lang_id predicts only known labels or 'und'") {
    val langs = TextAnalysis.tLangId(spark, sf)
      .select("pred_lang").distinct().as[String].collect().toSet
    assert(langs.subsetOf(Set("en", "de", "fr", "es", "und")))
  }

  test("quality score is bounded in [0,1]") {
    val df = TextAnalysis.tQuality(spark, sf)
    assert(df.filter(col("quality") < 0 || col("quality") > 1).count() == 0)
  }

  test("logprob: scores are negative, flag splits the corpus") {
    val df = TextAnalysis.tLogprob(spark, sf).cache()
    val n = df.count()
    assert(n > 0)
    // every unigram probability < 1 ⇒ every mean log-prob < 0
    assert(df.filter(col("logprob10") >= 0).count() == 0)
    // the flag must be wired to the rounded score and the threshold…
    assert(df.filter(col("low_prob") =!=
      (col("logprob10") < TextAnalysis.LogprobTau)).count() == 0)
    // …and the threshold must actually discriminate on this corpus
    val flagged = df.filter(col("low_prob")).count()
    assert(flagged > 0 && flagged < n,
      s"LogprobTau does not split the corpus: $flagged of $n flagged")
  }

  test("range join: binned rewrite matches the direct inequality join") {
    import graft.operators.Events
    // The direct formulation Spark would plan as a nested-loop join —
    // tolerable at sf0.001, and the ground truth the binning must
    // reproduce row-for-row.
    val e = graft.core.Tables(spark, sf).events
      .select(col("event_id"), expr("ts_ns div 1000000").as("t_ms"), col("value"))
    val naive = e.select(col("event_id"), col("t_ms"))
      .join(e.select(col("t_ms").as("p_ms"), col("value")),
        col("p_ms") >= col("t_ms") && col("p_ms") < col("t_ms") + Events.BandWindowMs)
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_window"), sum("value").as("naive_value"))
    val binned = Events.qRangeJoin(spark, sf)
    // The pair SET must be identical, so counts compare exactly. The
    // value sums accumulate in different physical orders (scan vs
    // shuffle), so they compare within float tolerance — rounding
    // first and demanding equality would trip on a .005 boundary ulp.
    val joined = binned.join(naive.withColumnRenamed("n_window", "naive_n"),
      Seq("event_id"), "full").cache()
    assert(joined.filter(col("n_window").isNull || col("naive_n").isNull).count() == 0,
      "binned and naive disagree on which events have a window")
    assert(joined.filter(col("n_window") =!= col("naive_n")).count() == 0,
      "binned pair set diverges from the direct inequality join")
    assert(joined.filter(
      abs(col("window_value") - col("naive_value")) > 1e-6).count() == 0,
      "window value sums diverge beyond float tolerance")
  }

  test("t_collocations matches a driver-side brute-force recompute exactly") {
    // Same normalization as TextFunctions.normText, in plain Scala.
    def toks(text: String): Array[String] =
      text.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ")
        .trim.split(" ")
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").as[String].collect()
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val bi = scala.collection.mutable.Map.empty[(String, String), Long]
    for (t <- texts; ws = toks(t)) {
      ws.foreach(w => uni(w) = uni.getOrElse(w, 0L) + 1L)
      ws.sliding(2).foreach {
        case Array(a, b) => bi((a, b)) = bi.getOrElse((a, b), 0L) + 1L
        case _ =>
      }
    }
    val nw = uni.values.sum.toDouble
    val nb = bi.values.sum.toDouble
    val expected = bi.iterator
      .filter(_._2 >= TextAnalysis.CollocMinCount)
      .map { case ((a, b), c) =>
        // identical op sequence to the operator's pmi column,
        // including the stableRound floor chain
        val pmi = math.log(c / nb * nw / uni(a) * nw / uni(b))
        (a, b, c, math.floor(pmi * 1e6 + 0.5) / 1e6)
      }
      .toSeq
      .sortBy { case (a, b, _, p) => (-p, a, b) }
      .take(TextAnalysis.CollocTopK)
    val got = TextAnalysis.tCollocations(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g == e, s"collocation row diverges: got $g expected $e")
    }
  }

  test("m_shard_pack matches a driver-side byte prefix-sum recompute exactly") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => (id, t.getBytes("UTF-8").length.toLong) }
      .sortBy(_._1)
    val b = graft.multimodal.Multimodal.ShardBytes
    var cum = 0L
    val expected = docs.map { case (id, n) =>
      val r = (id, n, cum / b, cum % b); cum += n; r
    }.toSeq
    val got = graft.multimodal.Multimodal.mShardPack(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g == e, s"shard row diverges: got $g expected $e")
    }
    // the budget actually splits this corpus into multiple shards
    assert(got.map(_._3).distinct.length > 1, "single shard proves nothing")
  }

  test("d_weighted_sample matches a driver-side exponential-keys recompute exactly") {
    def kk(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"wsmp:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16) % 10000
    }
    // Same normalization as TextFunctions.normText, in plain Scala.
    def words(text: String): Long =
      text.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ")
        .trim.split(" ").length.toLong
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "text").as[(Long, String, String)].collect()
    val expected = docs.map { case (id, lang, text) =>
      val w = words(text)
      val u = (kk(id) + 1) / 10001.0
      // identical op sequence to the operator's key column, including
      // the stableRound floor chain (JVM Math.log ≡ Spark's log)
      (id, lang, w, math.floor(math.log(u) / w * 1e9 + 0.5) / 1e9)
    }.sortBy(r => (-r._4, r._1)).take(Curation.WeightedSampleK).sortBy(_._1).toSeq
    val got = Curation.dWeightedSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g == e, s"weighted-sample row diverges: got $g expected $e")
    }
    // the sample must actually skew long: mean sampled weight exceeds
    // the corpus mean (weight-proportional inclusion)
    val corpusMean = docs.map(d => words(d._3)).sum.toDouble / docs.length
    val sampleMean = got.map(_._3).sum.toDouble / got.length
    assert(sampleMean > corpusMean,
      s"sample mean weight $sampleMean not above corpus mean $corpusMean")
  }

  test("q_retention matches a driver-side cohort recompute exactly") {
    // ts_ns is positive throughout the dataset, so Scala's
    // truncating Long division equals the operator's floor div.
    val ev = graft.core.Tables(SparkSpec.spark, sf).events
      .select("user_id", "ts_ns").as[(Long, Long)].collect()
      .map { case (u, t) => (u, t / Events.WeekNs) }
    val cohort = ev.groupBy(_._1).map { case (u, rs) => (u, rs.map(_._2).min) }
    val expected = ev.map { case (u, w) => (cohort(u), w - cohort(u), u) }
      .distinct
      .groupBy(r => (r._1, r._2))
      .map { case ((c, o), rs) => (c, o, rs.length.toLong) }
      .toSeq.sortBy(r => (r._1, r._2))
    val got = Events.qRetention(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g == e, s"retention cell diverges: got $g expected $e")
    }
    // offset-0 is every cohort's full size by definition — a sanity
    // anchor independent of the recompute above
    val sizes = cohort.values.groupBy(identity).map { case (c, us) => (c, us.size.toLong) }
    got.filter(_._2 == 0L).foreach { case (c, _, n) =>
      assert(n == sizes(c), s"cohort $c offset-0 cell $n != cohort size ${sizes(c)}")
    }
  }

  test("d_mix matches a driver-side epoch recompute exactly") {
    // Same salted-md5 draw as the operator, in plain JVM crypto.
    def kk(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"mix:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16) % 10000
    }
    val weights = Map("src0" -> 2.5, "src1" -> 1.5, "src2" -> 0.5)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source").as[(Long, String)].collect()
    val expected = docs.toSeq.flatMap { case (id, src) =>
      val w = weights.getOrElse(src, 1.0)
      val reps = math.floor(w).toLong +
        (if (kk(id) < (math.rint(w * 10000) % 10000).toLong) 1L else 0L)
      (1L to reps).map(e => (id, src, e))
    }.sortBy(r => (r._1, r._3))
    val got = Curation.dMix(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.length == expected.length,
      s"row count diverges: got ${got.length} expected ${expected.length}")
    got.zip(expected).foreach { case (g, e) =>
      assert(g == e, s"mix row diverges: got $g expected $e")
    }
    // the fractional arm actually fires both ways at this sf
    val bySrc = got.groupBy(_._2).map { case (s, rs) => (s, rs.length) }
    assert(bySrc.getOrElse("src0", 0) > bySrc.getOrElse("src3", 0),
      "oversampled source not amplified")
    assert(bySrc.getOrElse("src2", 0) < bySrc.getOrElse("src3", 0),
      "downsampled source not reduced")
  }

  test("d_dedup_incr equals the full-corpus pairs restricted to the new snapshot") {
    // The incremental plan must lose nothing: its result is by
    // definition dDedupNgram's pair set filtered to id2 in the new
    // snapshot (id-ordered pairs put the new member at id2).
    val full = Dedup.dDedupNgram(spark, sf)
      .filter(col("id2") >= Dedup.incrSplit(spark, sf))
    val incr = Dedup.dDedupIncr(spark, sf)
    assert(incr.count() > 0, "empty incremental pair set proves nothing")
    assert(incr.exceptAll(full).count() == 0,
      "incremental emits pairs the full recompute lacks")
    assert(full.exceptAll(incr).count() == 0,
      "incremental drops pairs the full recompute finds")
  }

  test("t_keywords matches a driver-side tf-idf recompute exactly") {
    // Same normalization as TextFunctions.normText, in plain Scala.
    def toks(text: String): Array[String] =
      text.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ")
        .trim.split(" ")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val n = docs.length.toDouble
    val tf = scala.collection.mutable.Map.empty[(Long, String), Long]
    docs.foreach { case (id, t) =>
      toks(t).foreach(w => tf((id, w)) = tf.getOrElse((id, w), 0L) + 1L)
    }
    val df = tf.keysIterator.toSeq.groupBy(_._2).map { case (w, ks) => (w, ks.size) }
    val expected = tf.iterator.map { case ((id, w), c) =>
      // identical op sequence to the operator's score column,
      // including the stableRound floor chain
      (id, w, math.floor(c * math.log(n / df(w)) * 1e6 + 0.5) / 1e6)
    }.toSeq.groupBy(_._1).toSeq.flatMap { case (id, rows) =>
      rows.sortBy { case (_, w, s) => (-s, w) }
        .take(TextAnalysis.KeywordTopK)
        .zipWithIndex.map { case ((_, w, s), i) => (id, (i + 1).toLong, w, s) }
    }.sortBy(r => (r._1, r._2))
    val got = TextAnalysis.tKeywords(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g == e, s"keyword row diverges: got $g expected $e")
    }
  }

  test("e_normalize emits unit vectors consistent with the stored norm") {
    // exploded shape: (vec_id, dim, unit_val, l2_norm), one row per element
    val rows = graft.operators.Embeddings.eNormalize(spark, sf).collect()
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.length == nVecs * 64, "one row per (vec_id, dim) expected")
    val byVec = rows.groupBy(_.getLong(0))
    byVec.take(50).foreach { case (id, rs) =>
      val norm = rs.head.getDouble(3)
      assert(norm > 0.0)
      assert(rs.forall(_.getDouble(3) == norm), s"vec $id norm varies across rows")
      assert(rs.map(_.getLong(1)).sorted.toSeq == (0L until 64L), s"vec $id dims not dense")
      val n2 = rs.sortBy(_.getLong(1)).foldLeft(0.0)((a, r) =>
        a + r.getDouble(2) * r.getDouble(2))
      assert(math.abs(n2 - 1.0) < 1e-9, s"vec $id unit norm² $n2 drifts from 1")
    }
  }

  test("e_centroid matches the naive per-label mean and counts every vector") {
    val cent = graft.operators.Embeddings.eCentroid(spark, sf).cache()
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val labels = emb.select("label").distinct().count()
    assert(cent.count() == labels * 64, "one row per (label, dim) expected")
    // n_vectors is the label's vector count on every dim row
    val counts = emb.groupBy("label").count()
    assert(cent.join(counts, "label").filter(col("n_vectors") =!= col("count")).count() == 0)
    // the hierarchical pinned fold must agree with a naive mean to
    // float tolerance (bit-equality is the oracle's job; this guards
    // semantics, not parity)
    val naive = emb.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("label", "dim").agg(avg(col("x").cast("double")).as("m"))
    val joined = cent.join(naive, Seq("label", "dim"))
    assert(joined.filter(abs(col("centroid") - col("m")) > 1e-9).count() == 0,
      "hierarchical fold diverges from the naive mean beyond tolerance")
  }

  test("e_quantize codes stay in int8 range and dequantize within half a step") {
    val raw = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // exploded shape: (vec_id, dim, q8, abs_max), one row per element
    val rows = graft.operators.Embeddings.eQuantize(spark, sf).collect()
    rows.groupBy(_.getLong(0)).take(100).foreach { case (id, rs) =>
      val amax = rs.head.getDouble(3)
      assert(rs.forall(_.getDouble(3) == amax), s"vec $id abs_max varies across rows")
      val q = rs.sortBy(_.getLong(1)).map(_.getInt(2)).toSeq
      assert(q.forall(v => v >= -127 && v <= 127), s"vec $id code out of int8 range")
      val step = amax / graft.operators.Embeddings.QuantLevels
      raw(id).zip(q).foreach { case (x, v) =>
        assert(math.abs(v * step - x.toDouble) <= step * 0.5 + 1e-12,
          s"vec $id dequant error beyond half a step")
      }
    }
  }

  test("token-budget cut is invariant across partition counts") {
    // the keyed distributed prefix sum must give the same answer no
    // matter how many range partitions a language spans — the property
    // that makes it a correct replacement for the per-language window
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    val wide = try {
      spark.conf.set(key, "7")
      Curation.dBudget(spark, sf).collect()
    } finally spark.conf.set(key, before)
    val narrow = Curation.dBudget(spark, sf).collect()
    assert(wide.toSeq == narrow.toSeq,
      "kept set depends on the partition count — the prefix bases are wrong")
    // keep rule: every kept doc started under budget
    assert(narrow.forall(_.getLong(3) < Curation.BudgetTokensPerLang))
    assert(narrow.nonEmpty)
  }

  test("source overlap bounds: ordered pairs, inter within set sizes, jacc in (0,1]") {
    val rows = Dedup.dSourceOverlap(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (na, nb, inter) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val jacc = r.getDouble(5)
      assert(a < b, s"unordered pair ($a,$b)")
      assert(inter >= 1 && inter <= math.min(na, nb),
        s"pair ($a,$b): inter $inter outside [1, min($na,$nb)]")
      assert(jacc > 0.0 && jacc <= 1.0, s"pair ($a,$b): jacc $jacc out of range")
    }
  }

  test("url extraction fields are self-consistent with the derived url") {
    val rows = graft.operators.WebCuration.tUrlExtract(spark, sf).collect()
    assert(rows.length ==
      spark.read.parquet(s"$sf/documents.parquet").count())
    rows.foreach { r =>
      val (url, host, dom, tld) =
        (r.getString(1), r.getString(2), r.getString(3), r.getString(4))
      val (depth, hasQ) = (r.getLong(5), r.getBoolean(6))
      assert(url.startsWith(s"https://$host/"), s"host $host not a prefix of $url")
      assert(host == dom || host == s"www.$dom", s"domain $dom inconsistent with $host")
      assert(dom.endsWith(s".$tld"), s"tld $tld inconsistent with $dom")
      assert(depth >= 1 && depth <= 3, s"path depth $depth outside [1,3]: $url")
      assert(hasQ == url.contains("?"), s"has_query $hasQ wrong for $url")
    }
  }

  test("domain budget keeps exactly the longest K docs per domain") {
    val cap = graft.operators.WebCuration.DomainCap
    val kept = graft.operators.WebCuration.dDomainBudget(spark, sf).collect()
    // recompute the expected kept set driver-side from the url map
    val dom = graft.operators.WebCuration.tUrlExtract(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val chars = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = dom.groupBy(_._2).flatMap { case (d, ids) =>
      ids.keys.toSeq.sortBy(id => (-chars(id), id)).take(cap)
        .zipWithIndex.map { case (id, i) => (id, d, i + 1L) }
    }.toSet
    val got = kept.map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    assert(got == expected, s"kept-set mismatch: ${(got -- expected).take(5)} vs ${(expected -- got).take(5)}")
    kept.groupBy(_.getString(1)).foreach { case (d, rs) =>
      assert(rs.length <= cap, s"domain $d exceeds cap: ${rs.length}")
      assert(rs.map(_.getLong(3)).sorted.toSeq == (1L to rs.length),
        s"domain $d ranks not dense")
    }
  }

  test("boilerplate rewrite: word accounting exact, untouched docs byte-identical") {
    val out = Dedup.dBoilerplate(spark, sf)
      .join(spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text"), "doc_id")
      .select(col("doc_id"), col("clean_text"), col("n_chunks"), col("n_removed"),
        graft.functions.TextFunctions.normText(col("text")).as("norm"))
      .collect()
    assert(out.nonEmpty && out.exists(_.getLong(3) > 0),
      "fixture exercised no boilerplate removal")
    out.foreach { r =>
      val (clean, nChunks, nRemoved, norm) =
        (r.getString(1), r.getLong(2), r.getLong(3), r.getString(4))
      assert(nRemoved >= 0 && nRemoved <= nChunks)
      val normWords = if (norm.isEmpty) 0 else norm.split(" ").length
      val cleanWords = if (clean.isEmpty) 0 else clean.split(" ").length
      assert(cleanWords == normWords - Dedup.ChunkWords * nRemoved,
        s"doc ${r.getLong(0)}: $cleanWords words after removing $nRemoved chunks from $normWords")
      if (nRemoved == 0)
        assert(clean == norm, s"doc ${r.getLong(0)} rewritten without removals")
      else
        // every surviving word sequence comes from the original in order
        assert(clean.isEmpty || norm.contains(clean.split(" ").head),
          s"doc ${r.getLong(0)} clean text not from original")
    }
  }

  test("containment: one-sided prefix filter is result-preserving vs the full index") {
    val sets = Dedup.ngramSets(spark, sf)
    val posts = sets.select(col("doc_id"), explode(col("hs")).as("h"))
    val fullCand = posts.as("a").join(posts.as("b"), "h")
      .filter(col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("id_in"), col("b.doc_id").as("id_of"))
      .dropDuplicates("id_in", "id_of")
    val full = fullCand
      .join(sets.select(col("doc_id").as("id_in"), col("hs").as("s1")), "id_in")
      .join(sets.select(col("doc_id").as("id_of"), col("hs").as("s2")), "id_of")
      .withColumn("inter", size(array_intersect(col("s1"), col("s2"))).cast("long"))
      .filter(col("inter") * 10 >= size(col("s1")).cast("long") * Dedup.ContainTauNum)
      .select("id_in", "id_of")
    val filtered = Dedup.dContainment(spark, sf).select("id_in", "id_of")
    assert(filtered.exceptAll(full).count() == 0 && full.exceptAll(filtered).count() == 0,
      "prefix-filtered containment pair set diverges from the full index")
  }

  test("containment matches a driver-side set recompute, sound and complete") {
    val sets = Dedup.ngramSets(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val rows = Dedup.dContainment(spark, sf).collect()
    assert(rows.nonEmpty, "no containment pairs on the fixture")
    rows.foreach { r =>
      val (a, b, inter, c) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(inter == (sets(a) & sets(b)).size.toLong, s"($a,$b) inter wrong")
      assert(inter * 10 >= sets(a).size.toLong * Dedup.ContainTauNum)
      assert(c >= 0.8 && c <= 1.0, s"($a,$b) score $c out of range")
      if (c == 1.0)
        assert(sets(a).subsetOf(sets(b)), s"($a,$b) scores 1.0 but A ⊄ B")
    }
    // completeness: every qualifying ordered pair and no other
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((a, sa) <- sets; (b, sb) <- sets if a != b) {
      val qualifies = (sa & sb).size.toLong * 10 >= sa.size.toLong * Dedup.ContainTauNum
      assert(qualifies == got.contains((a, b)), s"pair ($a,$b) presence mismatch")
    }
  }

  test("t_pii masks every span it counted, class by class") {
    import graft.operators.Pii
    val df = Pii.tPii(spark, sf).cache()
    // nothing pattern-shaped survives scrubbing
    Seq(Pii.EmailPattern, Pii.PhonePattern, Pii.IpPattern).foreach { pat =>
      assert(df.filter(col("scrubbed").rlike(pat)).count() == 0,
        s"unredacted span survives for $pat")
    }
    // redaction is count-preserving per class: n_<class> == mask occurrences
    def masks(m: String) =
      (length(col("scrubbed")) - length(replace(col("scrubbed"), lit(m), lit("")))) / m.length
    Seq("n_email" -> "[EMAIL]", "n_phone" -> "[PHONE]", "n_ip" -> "[IP]").foreach {
      case (c, m) =>
        assert(df.filter(col(c) =!= masks(m)).count() == 0, s"$c diverges from $m masks")
        assert(df.agg(sum(col(c))).head.getLong(0) > 0, s"injection never exercises $c")
    }
    // the flag is wired to the counts, and both sides are populated
    assert(df.filter(col("has_pii") =!=
      (col("n_email") + col("n_phone") + col("n_ip") > 0)).count() == 0)
    val clean = df.filter(!col("has_pii")).count()
    assert(clean > 0 && clean < df.count(), "PII flag does not split the corpus")
  }

  test("bigram LM: scores are nonpositive, bigram counts match word counts") {
    val df = TextAnalysis.tBigramLm(spark, sf).cache()
    val n = df.count()
    assert(n > 0)
    // every conditional probability ≤ 1 ⇒ every mean log-prob ≤ 0
    assert(df.filter(col("bigram_lp10") > 0).count() == 0)
    // n_bigrams = word_tokens - 1 doc for doc; docs with < 2 words drop out
    val wc = TextAnalysis.tTokenCount(spark, sf).select(col("doc_id"), col("word_tokens"))
    assert(df.join(wc, "doc_id")
      .filter(col("n_bigrams") =!= (col("word_tokens") - 1)).count() == 0,
      "bigram count diverges from word count - 1")
    assert(wc.filter(col("word_tokens") >= 2).count() == n,
      "docs with >= 2 words must all score")
    // flag wired to the rounded score, and the threshold discriminates
    assert(df.filter(col("low_fluency") =!=
      (col("bigram_lp10") < TextAnalysis.BigramLpTau)).count() == 0)
    val flagged = df.filter(col("low_fluency")).count()
    assert(flagged > 0 && flagged < n,
      s"BigramLpTau does not split the corpus: $flagged of $n flagged")
  }

  test("dsir: target-domain docs score higher than off-domain on average") {
    val df = Curation.dDsir(spark, sf)
      .join(graft.core.Tables(spark, sf).documents.select("doc_id", "lang"), "doc_id")
      .cache()
    assert(df.count() > 0)
    // The importance model is fit FOR the en slice; if en docs don't
    // out-score the rest on average the log-ratio is wired backwards.
    val means = df.groupBy(col("lang") === Curation.DsirTargetLang)
      .agg(avg("dsir_weight").as("w"))
      .as[(Boolean, Double)].collect().toMap
    assert(means(true) > means(false),
      s"en mean ${means(true)} !> rest mean ${means(false)}")
    // selection must discriminate: en docs clear the corpus baseline
    // at a higher rate than off-domain docs, and the cut is nontrivial
    val rates = df.groupBy(col("lang") === Curation.DsirTargetLang)
      .agg(avg(col("selected").cast("double")).as("r"))
      .as[(Boolean, Double)].collect().toMap
    assert(rates(true) > rates(false),
      s"en selection rate ${rates(true)} !> rest ${rates(false)}")
    val sel = df.filter(col("selected")).count()
    assert(sel > 0 && sel < df.count(), s"baseline cut degenerate: $sel selected")
    // flag is wired to the rounded weight vs the broadcast baseline
    assert(df.filter(col("selected") =!=
      (col("dsir_weight") > col("baseline"))).count() == 0)
  }

  test("readability counts: sentences, vowel-group syllables, clamp — on punctuated fixtures") {
    // the synthetic corpus has no sentence punctuation, so the
    // sentence/syllable mechanics are pinned on a written fixture
    val tmp = java.nio.file.Files.createTempDirectory("graft_read_").toString
    Seq(
      (0L, "The cat sat. The dog ran! Did it run?", "en", "web", 38L),
      (1L, "programming is wonderful today.", "en", "web", 31L),
      (2L, "qrst brr zz.", "und", "web", 12L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextAnalysis.tReadability(spark, tmp)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0L)._2 == 9 && got(0L)._3 == 3 && got(0L)._4 == 9,
      s"doc 0 counts: ${got(0L)}")
    assert(got(1L)._2 == 4 && got(1L)._3 == 1 && got(1L)._4 == 9,
      s"doc 1 counts: ${got(1L)}")
    // vowel-less words count one syllable each; no punctuation→clamped
    assert(got(2L)._2 == 3 && got(2L)._3 == 1 && got(2L)._4 == 3,
      s"doc 2 counts: ${got(2L)}")
    got.values.foreach { case (id, w, s, sy, fre) =>
      val expect = math.floor(
        (206.835 - (1.015 * (w.toDouble / s)) - (84.6 * (sy.toDouble / w))) * 1e4 + 0.5) / 1e4
      assert(fre == expect, s"doc $id fre $fre != $expect")
    }
  }

  test("incremental aggregate merge equals the full recompute") {
    import graft.operators.Analytics
    val merged = Analytics.qIncrAgg(spark, sf)
    val li = graft.core.Tables(spark, sf).lineitem
    val full = li.groupBy("l_returnflag", "l_linestatus")
      .agg(graft.functions.Parity.stableRound(sum(col("l_quantity")), 2).as("sum_qty"),
        graft.functions.Parity.stableRound(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        count(lit(1)).as("count_order"))
    assert(merged.count() == full.count())
    assert(merged.except(full).count() == 0 && full.except(merged).count() == 0,
      "view merge diverges from full recompute")
    // refresh path: a second call reuses the materialized history
    val again = Analytics.qIncrAgg(spark, sf)
    assert(again.except(full).count() == 0)
  }

  test("streaming funnel: one conversion per completing user, stages in order") {
    val df = graft.streaming.EventStream.stFunnel(spark, sf).cache()
    val n = df.count()
    assert(n > 0, "no conversions detected")
    assert(df.select("user_id").distinct().count() == n,
      "a user emitted more than one conversion row")
    assert(df.filter(col("view_us") > col("click_us") ||
      col("click_us") > col("purchase_us")).count() == 0,
      "stage timestamps out of order")
  }

  test("e_gram matches a driver-side recompute and covers the upper triangle") {
    import graft.operators.Embeddings
    val g = Embeddings.eGram(spark, sf).cache()
    val d = graft.core.Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect()
    val dim = d.head._2.length
    assert(g.count() == dim.toLong * (dim + 1) / 2, "upper triangle incomplete")
    // same sample predicate, tolerance-free structure checks + a
    // tolerant value check (the driver fold's op order differs from
    // this naive sum, so compare within float-accumulation slack)
    val md = java.security.MessageDigest.getInstance("MD5")
    def sampled(id: Long): Boolean = {
      val h = md.digest(s"grm:$id".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h, 16) % Embeddings.GramSampleMod == 0
    }
    val smp = d.filter { case (id, _) => sampled(id) }
    assert(smp.nonEmpty && smp.length < d.length, "sample degenerate")
    val got = g.select("dim_i", "dim_j", "gram", "n_vectors")
      .as[(Long, Long, Double, Long)].collect()
    assert(got.forall(_._4 == smp.length), "n_vectors != sample size")
    got.foreach { case (i, j, v, _) =>
      val naive = smp.map { case (_, e) => e(i.toInt).toDouble * e(j.toInt) }.sum
      assert(math.abs(naive - v) <= 1e-9 * math.max(1.0, math.abs(naive)),
        s"gram($i,$j)=$v diverges from naive $naive")
    }
    // diagonal entries are sums of squares
    assert(got.filter(t => t._1 == t._2).forall(_._3 >= 0.0))
  }

  test("semdedup keep set matches the greedy min-id rule, recomputed directly") {
    val df = Similarity.dSemdedup(spark, sf).cache()
    val n = df.count()
    assert(n > 0)
    val removed = df.filter(!col("keep")).count()
    assert(removed > 0 && removed < n, s"degenerate keep cut: $removed/$n removed")
    // direct recompute: within-label pairs over unit vectors
    val e = Similarity.withUnit(graft.core.Tables(spark, sf).embeddings,
      "embedding", "u")
    val witnesses = e.select(col("vec_id").as("ida"), col("label").as("la"),
        col("u").as("ua"))
      .join(e.select(col("vec_id").as("idb"), col("label").as("lb"),
        col("u").as("ub")),
        col("la") === col("lb") && col("ida") < col("idb"))
      .filter(Similarity.dot(col("ua"), col("ub")) >= Similarity.CosTau)
      .select(col("idb").as("vec_id")).distinct()
    val expectRemoved = witnesses.as[Long].collect().toSet
    val gotRemoved = df.filter(!col("keep")).select("vec_id").as[Long].collect().toSet
    assert(gotRemoved == expectRemoved,
      s"keep set diverges: extra=${gotRemoved -- expectRemoved} missing=${expectRemoved -- gotRemoved}")
  }

  test("dup spans match a driver-side sliding-window recompute exactly") {
    val L = Dedup.DupSpanWords
    val df = Dedup.dDupSpans(spark, sf).cache()
    assert(df.count() > 0)
    // independent recompute on raw window STRINGS (the operator
    // fingerprints with md5 — same equivalence classes), islands via
    // the textbook gap scan rather than the operator's lag window
    val ws = graft.core.Tables(spark, sf).documents
      .select(col("doc_id"), graft.functions.TextFunctions.words(col("text")).as("w"))
      .as[(Long, Seq[String])].collect()
    val wins = ws.toSeq.flatMap { case (id, w) =>
      if (w.length >= L)
        (0 to w.length - L).map(i => (id, i.toLong, w.slice(i, i + L).mkString(" ")))
      else Nil
    }
    val dup = wins.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
    val expect = wins.filter(t => dup(t._3)).groupBy(_._1).toSeq.flatMap {
      case (id, ts) =>
        val is = ts.map(_._2).sorted
        val spans = Seq.newBuilder[(Long, Long, Long, Long)]
        var (start, last, n) = (is.head, is.head, 0L)
        is.foreach { i =>
          if (i - last > L) {
            spans += ((id, start, last + L, n)); start = i; n = 0L
          }
          last = i; n += 1L
        }
        spans += ((id, start, last + L, n))
        spans.result()
    }.toSet
    val got = df.select("doc_id", "span_start", "span_end", "n_windows")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expect,
      s"spans diverge: extra=${got -- expect} missing=${expect -- got}")
    // structural: spans at least L words, non-overlapping per doc
    assert(df.filter(col("span_end") - col("span_start") < L).count() == 0)
    val overlaps = df.as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).values.map { ss =>
        val sorted = ss.sortBy(_._2)
        sorted.zip(sorted.tail).count { case (a, b) => b._2 < a._3 }
      }.sum
    assert(overlaps == 0, "overlapping spans within a doc")
  }

  test("training order is a dense md5 permutation, invariant across partition counts") {
    val df = Curation.dOrder(spark, sf).cache()
    val rows = df.as[(Long, String, Long)].collect()
    val n = rows.length.toLong
    assert(n > 0)
    assert(rows.map(_._3).sorted.sameElements(0L until n), "pos not a dense permutation")
    // pos is exactly the (shuffle_key, doc_id) sort order
    assert(rows.sortBy(t => (t._2, t._1)).map(_._3).sameElements(0L until n),
      "pos order diverges from the key sort")
    // the distributed two-pass rank must not depend on the partition
    // count (range boundaries move; ranks must not)
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val again = Curation.dOrder(spark, sf).as[(Long, String, Long)].collect()
      assert(again.toSet == rows.toSet, "rank changed with partition count")
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }

  test("q_profile matches direct per-column aggregates") {
    import graft.operators.Profiling
    val df = Profiling.qProfile(spark, sf).cache()
    assert(df.count() == Profiling.ProfileCols.length)
    val li = graft.core.Tables(spark, sf).lineitem
    Profiling.ProfileCols.foreach { c =>
      val r = df.filter(col("col_name") === c).head()
      val exp = li.agg(count(lit(1)), countDistinct(col(c)),
        min(col(c).cast("double")), max(col(c).cast("double"))).head()
      assert(r.getAs[Long]("n_rows") == exp.getLong(0), s"$c n_rows")
      assert(r.getAs[Long]("n_null") == 0L, s"$c n_null (TPC-H data carries none)")
      assert(r.getAs[Long]("ndv") == exp.getLong(1), s"$c ndv")
      assert(r.getAs[Double]("min_val") == exp.getDouble(2), s"$c min")
      assert(r.getAs[Double]("max_val") == exp.getDouble(3), s"$c max")
    }
  }

  test("q_profile ndv=approx: HLL estimate in error band, dedup exchange gone") {
    import graft.operators.Profiling
    val exact = Profiling.qProfile(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("ndv")).toMap
    spark.conf.set("graft.profile.ndv", "approx")
    try {
      val df = Profiling.qProfile(spark, sf)
      // the 100 TB shape: one aggregation pass, no partial-distinct
      // Expand/dedup exchange on (col_name, value)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Expand") && plan.contains("approx_count_distinct"),
        s"approx mode must plan the HLL sketch, not a distinct dedup:\n${plan.take(1500)}")
      df.collect().foreach { r =>
        val (c, got) = (r.getString(0), r.getAs[Long]("ndv"))
        val truth = exact(c)
        assert(math.abs(got - truth) <= math.max(2L, (truth * 0.15).toLong),
          s"$c: approx ndv $got too far from exact $truth")
      }
      // everything except ndv stays exact in approx mode
      val other = Profiling.qProfile(spark, sf).collect()
        .map(r => (r.getString(0), r.getAs[Long]("n_rows"),
          r.getAs[Long]("n_null"), r.getAs[Double]("min_val"),
          r.getAs[Double]("max_val"))).toSet
      spark.conf.unset("graft.profile.ndv")
      val exactOther = Profiling.qProfile(spark, sf).collect()
        .map(r => (r.getString(0), r.getAs[Long]("n_rows"),
          r.getAs[Long]("n_null"), r.getAs[Double]("min_val"),
          r.getAs[Double]("max_val"))).toSet
      assert(other == exactOther)
      intercept[IllegalArgumentException] {
        spark.conf.set("graft.profile.ndv", "hll")
        Profiling.qProfile(spark, sf)
      }
    } finally spark.conf.unset("graft.profile.ndv")
  }

  test("blocklist verdicts: rule precedence, coverage, both classes present") {
    import graft.operators.WebCuration
    val df = WebCuration.dBlocklist(spark, sf).cache()
    assert(df.count() > 0)
    // blocked ⇔ a rule matched
    assert(df.filter(col("blocked") =!= col("rule").isNotNull).count() == 0)
    // exact-domain rules win over the tld wildcard
    assert(df.filter(col("reg_domain").isInCollection(WebCuration.BlockedDomains)
        && !col("rule").startsWith("domain:")).count() == 0)
    assert(df.filter(col("tld").isInCollection(WebCuration.BlockedTlds)
        && !col("reg_domain").isInCollection(WebCuration.BlockedDomains)
        && col("rule") =!= concat(lit("tld:"), col("tld"))).count() == 0)
    // unblocked docs match no rule
    assert(df.filter(!col("blocked")
        && (col("reg_domain").isInCollection(WebCuration.BlockedDomains)
          || col("tld").isInCollection(WebCuration.BlockedTlds))).count() == 0)
    assert(df.filter(col("blocked")).count() > 0, "no doc blocked — degenerate")
    assert(df.filter(!col("blocked")).count() > 0, "all docs blocked — degenerate")
  }

  test("url_quality survives zero-path URLs: digit_frac 0.0, never NaN/NULL") {
    // Corpus-swap guard: withUrl's synthetic paths always carry ≥4
    // chars, but a real crawl routinely yields '/' and '' paths —
    // an unguarded 0/0 is NaN in Spark vs NULL in DuckDB and the
    // keep flag diverges between engines.
    val urls = Seq(
      (1L, "https://example.com/"),           // bare-slash path: 0 chars
      (2L, "https://example.com"),            // no path at all
      (3L, "https://example.com/?ref=x"),     // 0-char path + tracking
      (4L, "https://example.com/a1/22")       // control: 4 chars, 3 digits
    ).toDF("doc_id", "url")
    val got = graft.operators.WebCuration.urlQualityOf(urls)
      .select("doc_id", "digit_frac", "is_tracking", "keep")
      .as[(Long, Double, Boolean, Boolean)].collect().map(r => r._1 -> r).toMap
    Seq(1L, 2L, 3L).foreach { id =>
      val (_, frac, _, _) = got(id)
      assert(!frac.isNaN && frac == 0.0, s"doc $id digit_frac = $frac")
    }
    assert(got(1L)._4 && got(2L)._4, "zero-path non-tracking URLs must keep")
    assert(!got(3L)._4, "tracking rule must still fire on a zero-path URL")
    assert(got(4L)._2 == 0.75 && !got(4L)._4, "digit-heavy control path must drop")
  }

  test("e_rproject equals the driver-side Rademacher projection exactly") {
    import graft.operators.Embeddings
    val got = Embeddings.eRproject(spark, sf)
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val vecs = graft.core.Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
    assert(got.size == vecs.length * Embeddings.RProjDims)
    vecs.foreach { case (id, e) =>
      (0 until Embeddings.RProjDims).foreach { r =>
        // identical op sequence: ascending-dim left fold from 0.0
        var acc = 0.0
        e.indices.foreach(d => acc += e(d).toDouble * Embeddings.rpSign(r, d))
        val expect = acc / math.sqrt(Embeddings.RProjDims.toDouble)
        assert(got((id, r.toLong)) == expect, s"vec $id comp $r")
      }
    }
  }

  test("e_pca: orthonormal, eigen-residual-small, descending, sign-pinned, deterministic") {
    import graft.operators.Embeddings
    val rows = Embeddings.ePca(spark, sf)
      .as[(Long, Long, Double, Double, Double)].collect()
    val dim = rows.map(_._2).max.toInt + 1
    assert(rows.length == Embeddings.PcaComps * dim)
    val comps = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (c, rs) =>
      val v = rs.sortBy(_._2).map(_._3).toArray
      (c, v, rs.head._4, rs.head._5)
    }
    // descending nonnegative eigenvalues (the Gram is PSD)
    val eig = comps.map(_._3)
    assert(eig.zip(eig.tail).forall { case (a, b) => a >= b }, s"not descending: $eig")
    assert(eig.forall(_ >= -1e-9), s"negative eigenvalue: $eig")
    // orthonormal loadings
    comps.foreach { case (c, v, _, _) =>
      val n2 = v.map(x => x * x).sum
      assert(math.abs(n2 - 1.0) <= 1e-9, s"comp $c norm² $n2")
    }
    comps.combinations(2).foreach { case Seq((ci, vi, _, _), (cj, vj, _, _)) =>
      val d = vi.zip(vj).map { case (a, b) => a * b }.sum
      assert(math.abs(d) <= 1e-8, s"comps ${ci}x${cj} = $d")
    }
    // sign pin: the largest-|loading| dim (first on ties) is positive
    comps.foreach { case (c, v, _, _) =>
      val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
      assert(v(pivot) >= 0.0, s"comp $c sign not pinned")
    }
    // eigen residual ‖Gv − λv‖ against the Gram the operator consumed
    val g = Embeddings.eGram(spark, sf)
      .select("dim_i", "dim_j", "gram").as[(Long, Long, Double)].collect()
    val m = Array.ofDim[Double](dim, dim)
    g.foreach { case (i, j, x) => m(i.toInt)(j.toInt) = x; m(j.toInt)(i.toInt) = x }
    val scale = math.max(comps.map(_._3).max, 1.0)
    comps.foreach { case (c, v, lam, _) =>
      val res = (0 until dim).map { i =>
        val gv = (0 until dim).map(j => m(i)(j) * v(j)).sum
        val r = gv - lam * v(i)
        r * r
      }.sum
      assert(math.sqrt(res) <= 1e-7 * scale, s"comp $c residual ${math.sqrt(res)}")
    }
    // var_ratio sums to ≤ 1 and is each λ / trace
    val trace = (0 until dim).map(i => m(i)(i)).sum
    comps.foreach { case (c, _, lam, vr) =>
      assert(math.abs(vr - lam / trace) <= 1e-12, s"comp $c var_ratio")
    }
    // determinism: a second run reproduces every double bit-for-bit
    val again = Embeddings.ePca(spark, sf)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(again.sortBy(t => (t._1, t._2)).sameElements(rows.sortBy(t => (t._1, t._2))))
  }

  test("e_whiten: training sample's second moment is the identity, deterministic") {
    import graft.operators.Embeddings
    val z = Embeddings.eWhiten(spark, sf)
      .as[(Long, Long, Double)].collect()
    val k = Embeddings.PcaComps
    // restrict to the vectors the Gram trained on (the md5 sample) —
    // whitening is calibrated to exactly that second moment
    val sampleIds = graft.core.Tables(spark, sf).embeddings
      .filter(graft.functions.TextFunctions.md5_32(
          concat(lit("grm:"), col("vec_id").cast("string")))
        % Embeddings.GramSampleMod === 0)
      .select("vec_id").as[Long].collect().toSet
    val byVec = z.filter(t => sampleIds.contains(t._1))
      .groupBy(_._1).view.mapValues(rs => rs.sortBy(_._2).map(_._3)).toMap
    assert(byVec.nonEmpty && byVec.head._2.length == k)
    val n = byVec.size
    for (i <- 0 until k; j <- i until k) {
      val m = byVec.values.map(v => v(i) * v(j)).sum / n
      val want = if (i == j) 1.0 else 0.0
      // z is presentation-rounded at 1e-6; the moment inherits ~1e-5
      assert(math.abs(m - want) <= 1e-3, s"moment($i,$j) = $m")
    }
    // whole-corpus output shape: every vector, every component
    val nAll = graft.core.Tables(spark, sf).embeddings.count()
    assert(z.length == nAll * k)
    val again = Embeddings.eWhiten(spark, sf).as[(Long, Long, Double)].collect()
    assert(again.sortBy(t => (t._1, t._2)).sameElements(z.sortBy(t => (t._1, t._2))))
  }

  test("d_audit: kept set is exactly d_curate's output minus blocked domains") {
    import graft.operators.{Curation, WebCuration}
    // ONE dAudit run serves every assertion — the operator embeds the
    // clustering + three regex-heavy corpus passes
    val audit = Curation.dAudit(spark, sf)
      .select("doc_id", "kept", "dropped_by")
      .as[(Long, Boolean, Option[String])].collect()
    val auditKept = audit.collect { case (id, true, _) => id }.toSet
    val curateKept = Curation.dCurate(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    val blocked = WebCuration.dBlocklist(spark, sf)
      .filter(col("blocked")).select("doc_id").as[Long].collect().toSet
    assert(auditKept == (curateKept -- blocked),
      s"audit kept diverged: extra=${auditKept -- (curateKept -- blocked)} " +
        s"missing=${(curateKept -- blocked) -- auditKept}")
    // every document gets a verdict, and dropped docs carry a rule
    assert(audit.length == graft.core.Tables(spark, sf).documents.count())
    val rules = audit.collect { case (_, false, r) => r }.toSet
    assert(rules.forall(_.exists(Set("exact_dup", "near_dup", "low_quality",
      "lang_und", "blocked_domain"))), s"unknown rule in $rules")
  }

  test("caption pairs: aligned positive, stride negative, exact cosine hardness") {
    import graft.multimodal.Multimodal
    val df = Multimodal.mCaptionPair(spark, sf).cache()
    val emb = graft.core.Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().toMap
    val n = emb.size.toLong
    assert(df.count() > 0)
    assert(df.filter(col("pos_vec_id") =!= col("doc_id")).count() == 0)
    assert(df.filter(col("neg_vec_id") =!=
      pmod(col("doc_id") + lit(Multimodal.NegStride), lit(n))).count() == 0)
    assert(df.filter(col("neg_vec_id") === col("pos_vec_id")).count() == 0)
    df.select("pos_vec_id", "neg_vec_id", "hardness")
      .as[(Long, Long, Double)].collect().foreach { case (p, ng, h) =>
        assert(h >= -1.0 - 1e-12 && h <= 1.0 + 1e-12, s"cosine out of range: $h")
        val (a, b) = (emb(p), emb(ng))
        var (dab, daa, dbb) = (0.0, 0.0, 0.0)
        a.indices.foreach { i =>
          dab += a(i).toDouble * b(i).toDouble
          daa += a(i).toDouble * a(i).toDouble
          dbb += b(i).toDouble * b(i).toDouble
        }
        val expect = dab / (math.sqrt(daa) * math.sqrt(dbb))
        assert(h == expect, s"pair ($p,$ng): $h != $expect")
      }
  }

  test("st_anomaly: integer z² decision matches a batch recompute, warm-up and tail honored") {
    import graft.streaming.EventStream
    val df = EventStream.stAnomaly(spark, sf).cache()
    assert(df.count() > 0)
    // batch recompute of the integer sufficient statistics
    val ev = graft.core.Tables(spark, sf).events
      .select(col("event_type"), expr("ts_ns div 3600000000000").as("b"))
      .groupBy("event_type", "b").agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2).map(t => (t._2, t._3)).toSeq }
    val expect = ev.toSeq.flatMap { case (et, buckets) =>
      var (n, s, q) = (0L, 0L, 0L)
      val rows = buckets.zipWithIndex.flatMap { case ((b, c), i) =>
        val row = if (n >= EventStream.AnomalyMinBaseline && i < buckets.length - 1) {
          val dev = n * c - s
          Some((et, b, c, n, dev * dev, EventStream.AnomalyTauSq * (n * q - s * s)))
        } else None
        n += 1L; s += c; q += c * c
        row
      }
      rows
    }.toSet
    val got = df.select("event_type", "hour_bucket", "n_events", "n_prior",
      "dev2", "bound").as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == expect,
      s"anomaly rows diverge: extra=${got -- expect} missing=${expect -- got}")
    // flag consistency
    assert(df.filter(col("is_anomaly") =!= (col("dev2") > col("bound"))).count() == 0)
  }

  test("d_cluster star mode is bit-identical to min-label propagation") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val base = rows(Dedup.dCluster(spark, sf))
    val baseIncr = rows(Dedup.dClusterIncr(spark, sf))
    spark.conf.set("graft.cluster.ccMode", "star")
    try {
      val star = rows(Dedup.dCluster(spark, sf))
      assert(star == base,
        s"modes diverge: extra=${star -- base} missing=${base -- star}")
      // the conf routes the whole clustering family, incremental included
      assert(rows(Dedup.dClusterIncr(spark, sf)) == baseIncr,
        "incremental clustering must follow the same mode and agree")
    } finally spark.conf.unset("graft.cluster.ccMode")
    intercept[IllegalArgumentException] {
      spark.conf.set("graft.cluster.ccMode", "minlable")
      try Dedup.dCluster(spark, sf)
      finally spark.conf.unset("graft.cluster.ccMode")
    }
  }

  test("t_jsd matches a driver-side reference JSD exactly; bounded by 1 bit") {
    // Reference: plain-Scala word counts per source, same guarded
    // term expression, same ascending-term fold, same ⌊x·1e6+½⌋
    // rounding — agreement is exact, not approximate.
    val docs = graft.core.Tables(spark, sf).documents
      .select(col("source"),
        graft.functions.TextFunctions.words(col("text")).as("w"))
      .as[(String, Seq[String])].collect()
    val counts = scala.collection.mutable.Map[(String, String), Long]()
    docs.foreach { case (s, ws) =>
      ws.foreach(w => counts((s, w)) = counts.getOrElse((s, w), 0L) + 1L)
    }
    val corpusC = counts.groupBy(_._1._2).map { case (w, m) => w -> m.values.sum }
    val nsBySrc = counts.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val nvBySrc = counts.groupBy(_._1._1).map { case (s, m) => s -> m.size.toLong }
    val nn = corpusC.values.sum
    val expect = nsBySrc.keys.map { s =>
      val ns = nsBySrc(s)
      val terms = corpusC.toSeq.map { case (w, c) =>
        val cs = counts.getOrElse((s, w), 0L)
        val ps = if (cs > 0) cs.toDouble / ns.toDouble else 0.0
        val pr = if (c - cs > 0) (c - cs).toDouble / (nn - ns).toDouble else 0.0
        val m = (ps + pr) / 2.0
        0.5 * (if (ps > 0) ps * math.log(ps / m) else 0.0) +
          0.5 * (if (pr > 0) pr * math.log(pr / m) else 0.0)
      }
      val jsd = terms.sorted.foldLeft(0.0)(_ + _) / math.log(2.0)
      s -> math.floor(jsd * 1e6 + 0.5) / 1e6
    }.toMap
    val got = TextAnalysis.tJsd(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (s, (nw, nv, jsd)) =>
      assert(nw == nsBySrc(s) && nv == nvBySrc(s), s"$s totals")
      assert(jsd == expect(s), s"$s: jsd $jsd want ${expect(s)}")
      assert(jsd >= 0.0 && jsd <= 1.0, s"$s: JSD out of [0,1] bits: $jsd")
    }
    // the synthetic sources genuinely differ, but none is alien
    assert(got.values.exists(_._3 > 0.0), "some source must diverge from the rest")
  }

  test("t_drift matches a driver-side two-snapshot reference exactly") {
    val docs = graft.core.Tables(spark, sf).documents
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.words(col("text")).as("w"))
      .as[(Long, String, Seq[String])].collect()
    // the incremental-dedup family's split: delta = md5 bucket ≥ 90
    def isDelta(id: Long): Boolean = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = h.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 100 >= 90
    }
    val cb = scala.collection.mutable.Map[(String, String), Long]()
    val cd = scala.collection.mutable.Map[(String, String), Long]()
    docs.foreach { case (id, s, ws) =>
      val m = if (isDelta(id)) cd else cb
      ws.foreach(w => m((s, w)) = m.getOrElse((s, w), 0L) + 1L)
    }
    val sources = (cb.keys ++ cd.keys).map(_._1).toSet
    val expect = sources.flatMap { s =>
      val nb = cb.collect { case ((`s`, _), c) => c }.sum
      val nd = cd.collect { case ((`s`, _), c) => c }.sum
      if (nb == 0 || nd == 0) None
      else {
        val vocab = (cb.keys ++ cd.keys).collect { case (`s`, w) => w }.toSet
        val terms = vocab.toSeq.map { w =>
          val b = cb.getOrElse((s, w), 0L)
          val dl = cd.getOrElse((s, w), 0L)
          val pb = if (b > 0) b.toDouble / nb.toDouble else 0.0
          val pd = if (dl > 0) dl.toDouble / nd.toDouble else 0.0
          val m = (pb + pd) / 2.0
          0.5 * (if (pb > 0) pb * math.log(pb / m) else 0.0) +
            0.5 * (if (pd > 0) pd * math.log(pd / m) else 0.0)
        }
        val jsd = terms.sorted.foldLeft(0.0)(_ + _) / math.log(2.0)
        Some(s -> (nb, nd, math.floor(jsd * 1e6 + 0.5) / 1e6))
      }
    }.toMap
    val got = TextAnalysis.tDrift(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == expect.keySet,
      s"sources diverge: extra=${got.keySet -- expect.keySet} missing=${expect.keySet -- got.keySet}")
    got.foreach { case (s, v) =>
      assert(v == expect(s), s"$s: got $v want ${expect(s)}")
      assert(v._3 >= 0.0 && v._3 <= 1.0, s"$s: JSD out of [0,1] bits")
    }
    // the held-out batch genuinely differs from its base somewhere
    assert(got.values.exists(_._3 > 0.0), "some source must drift")
  }

  test("t_jsd free fold mode: same ranking as parity, plan carries no collect_list") {
    val parity = TextAnalysis.tJsd(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    spark.conf.set("graft.text.jsdFold", "free")
    try {
      val freeDf = TextAnalysis.tJsd(spark, sf)
      val plan = freeDf.queryExecution.executedPlan.toString
      assert(!plan.contains("collect_list"),
        "free mode must not collect per-source term lists")
      val free = freeDf.collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
      assert(free.keySet == parity.keySet)
      free.foreach { case (s, v) =>
        assert(math.abs(v - parity(s)) < 1e-9, s"$s: free $v vs parity ${parity(s)}")
      }
    } finally spark.conf.unset("graft.text.jsdFold")
    intercept[IllegalArgumentException] {
      spark.conf.set("graft.text.jsdFold", "fre")
      try TextAnalysis.tJsd(spark, sf)
      finally spark.conf.unset("graft.text.jsdFold")
    }
  }

  test("d_lsh_tune: recall falls as rows/band sharpen; independent recompute agrees") {
    val rows = Dedup.dLshTune(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getBoolean(2), r.getLong(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Dedup.LshTuneConfigs.map(_._1),
      "one row per budget factorization, bands ascending")
    assert(rows.count(_._3) == 1, "exactly one row is the production config")
    assert(rows.forall(t => t._5 >= 0.0 && t._5 <= 1.0))
    // the S-curve trade: spending the budget on MORE bands of FEWER
    // rows can only raise expected recall (1-(1-s^r)^b at fixed b·r
    // is decreasing in r for s in (0,1])
    val byRows = rows.sortBy(_._2).map(_._5)
    assert(byRows.zip(byRows.tail).forall { case (lo, hi) => lo >= hi },
      s"expected recall must fall as rows/band grow: ${byRows.toSeq}")
    // independent recompute: driver-side mean of 1-(1-s^r)^b over the
    // operator's own truth pairs (plain math.pow is fine here — the
    // spec allows float noise; the ORACLE is the bit-exact check)
    val truth = Dedup.dDedupNgram(spark, sf)
      .select("jaccard").collect().map(_.getDouble(0))
    rows.foreach { case (b, r, _, n, got) =>
      assert(n == truth.length.toLong)
      val want = truth.map(s => 1.0 - math.pow(1.0 - math.pow(s, r), b)).sum / n
      assert(math.abs(got - want) < 1e-6, s"($b,$r): $got vs $want")
    }
  }

  test("d_lsh_tune free fold ≡ parity fold; free plans no truth-set row") {
    // the jsdFold twin: `free` swaps the oracle-bit-exact single-row
    // sorted fold for a map-side-combined sum (the 100 TB shape) —
    // same counts, means equal to summation-order noise
    val parity = Dedup.dLshTune(spark, sf).collect()
      .map(r => (r.getInt(0), (r.getLong(3), r.getDouble(4)))).toMap
    spark.conf.set("graft.dedup.lshTuneFold", "free")
    val free =
      try Dedup.dLshTune(spark, sf).collect()
        .map(r => (r.getInt(0), (r.getLong(3), r.getDouble(4)))).toMap
      finally spark.conf.unset("graft.dedup.lshTuneFold")
    assert(free.keySet == parity.keySet)
    parity.foreach { case (b, (n, recall)) =>
      assert(free(b)._1 == n, s"bands=$b: n_truth ${free(b)._1} vs $n")
      assert(math.abs(free(b)._2 - recall) <= 1e-9,
        s"bands=$b: free ${free(b)._2} vs parity $recall")
    }
    intercept[IllegalArgumentException] {
      spark.conf.set("graft.dedup.lshTuneFold", "fre")
      try Dedup.dLshTune(spark, sf)
      finally spark.conf.unset("graft.dedup.lshTuneFold")
    }
  }

  test("d_lsh_tune doc-sample gate ≡ full truth restricted to gated docs") {
    // the sampled run must equal the full pipeline restricted to
    // pairs whose BOTH endpoints pass the md5 gate — the property
    // that makes the per-pair expectation unbiased on retained pairs
    val n = 2
    def gated(id: Long): Boolean =
      java.lang.Long.parseLong(md5Hex(s"lshs:$id").substring(0, 8), 16) % n == 0
    val fullGated = Dedup.dDedupNgram(spark, sf)
      .select("id1", "id2", "jaccard")
      .as[(Long, Long, Double)].collect()
      .filter(p => gated(p._1) && gated(p._2))
    assert(fullGated.nonEmpty, "gate left no pairs — test fixture degenerate")
    spark.conf.set("graft.dedup.lshTuneSample", n.toString)
    val rows =
      try Dedup.dLshTune(spark, sf).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(3), r.getDouble(4)))
      finally spark.conf.unset("graft.dedup.lshTuneSample")
    rows.foreach { case (b, r, nTruth, got) =>
      assert(nTruth == fullGated.length.toLong,
        s"($b,$r): sampled n_truth $nTruth vs gated full ${fullGated.length}")
      val want = fullGated
        .map(p => 1.0 - math.pow(1.0 - math.pow(p._3, r), b)).sum / nTruth
      assert(math.abs(got - want) < 1e-6, s"($b,$r): $got vs $want")
    }
  }

  test("d_decontam_report matches a driver rollup of the decontaminate verdicts") {
    def bucket(id: Long): Long =
      java.lang.Long.parseLong(md5Hex(id.toString).substring(0, 8), 16) % 100
    val srcs = graft.core.Tables(spark, sf).documents
      .select("doc_id", "source").as[(Long, String)].collect()
    val verdicts = Dedup.dDecontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val bySource = srcs.filter(p => bucket(p._1) < 80).groupBy(_._2)
    val got = Dedup.dDecontamReport(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    assert(got.keySet == bySource.keySet, "one row per train source")
    bySource.foreach { case (src, docs) =>
      val (nTrain, nFlag, pct, maxOv) = got(src)
      assert(nTrain == docs.length.toLong, s"$src n_train")
      val flagged = docs.count(d => verdicts.get(d._1).exists(_._2))
      assert(nFlag == flagged.toLong, s"$src n_flagged")
      assert(math.abs(pct - flagged.toDouble / docs.length) < 1e-6, s"$src pct")
      val wantMax = docs.map(d => verdicts.get(d._1).map(_._1).getOrElse(0L)).max
      assert(maxOv == wantMax, s"$src max_overlap")
    }
    assert(got.values.exists(_._2 > 0), "no source flags anything — degenerate")
  }

  test("d_span_scrub drops exactly the d_dup_spans words and keeps the rest in order") {
    val spans = Dedup.dDupSpans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val docs = graft.core.Tables(spark, sf).documents
      .select(col("doc_id"),
        graft.functions.TextFunctions.words(col("text")).as("w"))
      .as[(Long, Seq[String])].collect().toMap
    val got = Dedup.dSpanScrub(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == docs.keySet, "scrub must emit every document")
    assert(spans.nonEmpty, "fixture has no duplicated spans — degenerate")
    docs.foreach { case (id, w) =>
      val sp = spans.getOrElse(id, Array.empty)
      val keep = w.indices.filterNot(i =>
        sp.exists { case (_, s, e) => i >= s && i < e })
      val (text, nWords, nDropped) = got(id)
      assert(nWords == w.length.toLong, s"doc $id n_words")
      assert(nDropped == sp.map { case (_, s, e) => e - s }.sum, s"doc $id n_dropped")
      assert(text == keep.map(w).mkString(" "), s"doc $id scrubbed text")
    }
    // the pass did real work somewhere AND never empties the corpus
    assert(got.values.exists(_._3 > 0) && got.values.exists(_._3 == 0))
  }

  test("d_decontam_scrub scrubs exactly the maximal leaked test-set spans") {
    def bucket(id: Long): Long =
      java.lang.Long.parseLong(md5Hex(id.toString).substring(0, 8), 16) % 100
    def h32(s: String): Long =
      java.lang.Long.parseLong(md5Hex(s).substring(0, 8), 16)
    val L = Dedup.ContamNgram
    val docs = graft.core.Tables(spark, sf).documents
      .select(col("doc_id"),
        graft.functions.TextFunctions.words(col("text")).as("w"))
      .as[(Long, Seq[String])].collect()
    def wins(w: Seq[String]): Seq[(Int, Long)] =
      if (w.length < L) Seq.empty
      else (0 to w.length - L).map(i => i -> h32(w.slice(i, i + L).mkString(" ")))
    val testSet = docs.filter(d => bucket(d._1) >= 90)
      .flatMap(d => wins(d._2).map(_._2)).toSet
    val train = docs.filter(d => bucket(d._1) < 80)
    val got = Dedup.dDecontamScrub(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == train.map(_._1).toSet, "one row per train doc")
    var anyDropped = false
    train.foreach { case (id, w) =>
      val hitIs = wins(w).filter(p => testSet(p._2)).map(_._1)
      // island merge: a hit chains while its gap to the PREVIOUS hit
      // start is <= L (overlapping or exactly abutting windows)
      val islands = hitIs.foldLeft(List.empty[List[Int]]) {
        case (cur :: rest, i) if i - cur.head <= L => (i :: cur) :: rest
        case (acc, i) => List(i) :: acc
      }
      val spans = islands.map(isl => (isl.min, isl.max + L)).sortBy(_._1)
      val keep = w.indices.filterNot(i =>
        spans.exists(sp => i >= sp._1 && i < sp._2))
      val (text, nWords, nDropped) = got(id)
      assert(nWords == w.length.toLong, s"doc $id n_words")
      assert(nDropped == spans.map(sp => sp._2 - sp._1).sum.toLong,
        s"doc $id n_dropped")
      assert(text == keep.map(w).mkString(" "), s"doc $id scrubbed text")
      anyDropped ||= spans.nonEmpty
    }
    assert(anyDropped, "fixture has no train-test contamination — degenerate")
  }

  test("t_novelty matches a driver recompute of unseen-8-gram fractions") {
    def bucket(id: Long): Long =
      java.lang.Long.parseLong(md5Hex(id.toString).substring(0, 8), 16) % 100
    def h32(s: String): Long =
      java.lang.Long.parseLong(md5Hex(s).substring(0, 8), 16)
    val L = Dedup.ContamNgram
    val docs = graft.core.Tables(spark, sf).documents
      .select(col("doc_id"),
        graft.functions.TextFunctions.words(col("text")).as("w"))
      .as[(Long, Seq[String])].collect()
    def shs(w: Seq[String]): Set[Long] =
      if (w.length < L) Set.empty
      else (0 to w.length - L).map(i => h32(w.slice(i, i + L).mkString(" "))).toSet
    val base = docs.filter(d => bucket(d._1) < 90).flatMap(d => shs(d._2)).toSet
    val delta = docs.filter(d => bucket(d._1) >= 90)
    val got = TextAnalysis.tNovelty(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == delta.filter(d => shs(d._2).nonEmpty).map(_._1).toSet,
      "one row per delta doc with >=1 shingle")
    delta.foreach { case (id, w) =>
      val s = shs(w)
      if (s.nonEmpty) {
        val (nGrams, nSeen, novelty) = got(id)
        assert(nGrams == s.size.toLong, s"doc $id n_grams")
        assert(nSeen == s.count(base).toLong, s"doc $id n_seen")
        assert(math.abs(novelty - (1.0 - nSeen.toDouble / nGrams)) < 1e-6,
          s"doc $id novelty")
      }
    }
    // the fixture must exercise both directions: some reuse, some new
    assert(got.values.exists(_._2 > 0), "no delta doc reuses base grams")
    assert(got.values.exists(_._3 > 0), "every delta doc is fully stale")
  }

  test("t_novelty bloom tier: n_grams identical, no false negatives, measured fpp") {
    val exact = TextAnalysis.tNovelty(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    spark.conf.set("graft.text.noveltyProbe", "bloom")
    val bloom = try TextAnalysis.tNovelty(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    finally spark.conf.unset("graft.text.noveltyProbe")
    assert(bloom.keySet == exact.keySet, "bloom tier changed the doc set")
    var extra = 0L
    var unseen = 0L
    exact.foreach { case (id, (ng, ns)) =>
      val (bg, bs) = bloom(id)
      assert(bg == ng, s"doc $id n_grams drifted in bloom mode")
      assert(bs >= ns, s"doc $id: bloom LOST a seen gram (false negative)")
      assert(bs <= ng, s"doc $id: seen exceeds grams")
      extra += bs - ns
      unseen += ng - ns
    }
    assert(unseen > 0, "fixture degenerate: no unseen grams to test fpp on")
    assert(extra.toDouble / unseen < 0.01,
      s"bloom false-positive rate out of bound: $extra of $unseen unseen grams")
  }

  test("q_partition_hist matches a driver-side recompute of every bucket") {
    import graft.operators.Profiling
    val B = Profiling.HistBuckets
    def h32(s: String): Long =
      java.lang.Long.parseLong(md5Hex(s).substring(0, 8), 16)
    val li = graft.core.Tables(spark, sf).lineitem
      .selectExpr(Profiling.SkewCols.map(c => s"cast($c as bigint) as $c"): _*)
      .collect()
    val got = Profiling.qPartitionHist(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.map(_._1).toSet == Profiling.SkewCols.toSet)
    val n = li.length.toLong
    Profiling.SkewCols.zipWithIndex.foreach { case (c, idx) =>
      val counts = li.map(r => h32(r.getLong(idx).toString) % B)
        .groupBy(identity).map { case (b, vs) => b -> vs.length.toLong }
      val rows = got.filter(_._1 == c)
      assert(rows.map(_._2).toSet == counts.keySet, s"$c bucket set")
      rows.foreach { case (_, b, cnt, share, skew) =>
        assert(cnt == counts(b), s"$c bucket $b rows")
        assert(math.abs(share - cnt.toDouble / n) < 1e-6, s"$c bucket $b share")
        assert(math.abs(skew - cnt.toDouble * B / n) < 1e-4, s"$c bucket $b skew")
      }
      // a uniform hash of a high-ndv key cannot starve a bucket (the
      // low-ndv supplier key at sf0.001 legitimately leaves gaps)
      if (li.map(_.getLong(idx)).distinct.length >= 8 * B)
        assert(rows.length == B, s"$c: ${rows.length} of $B buckets hit")
    }
  }

  test("q_broadcast_audit matches a driver recompute and its schema map is current") {
    import graft.operators.Profiling
    import org.apache.spark.sql.types._
    val t = graft.core.Tables(spark, sf)
    val got = Profiling.qBroadcastAudit(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(got.keySet == Profiling.AuditTables.map(_._1).toSet)
    Profiling.AuditTables.foreach { case (name, cols) =>
      val df = t.table(name)
      // drift guard: the STATIC kind map must match the file's actual
      // schema — a testdata regeneration that shifts a type fails here
      // instead of silently mis-estimating
      val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
      assert(byName.keySet == cols.map(_._1).toSet, s"$name columns drifted")
      cols.foreach { case (c, kind) =>
        val ok = (kind, byName(c)) match {
          case ("fixed4", IntegerType) => true
          case ("fixed8", LongType | DoubleType | TimestampType |
                          TimestampNTZType) => true
          case ("string", StringType) => true
          case _ => false
        }
        assert(ok, s"$name.$c: kind $kind vs actual ${byName(c)}")
      }
      val rows = df.collect()
      val est = rows.map { r =>
        cols.map {
          case (_, "fixed4") => 4L
          case (_, "fixed8") => 8L
          case (c, _) =>
            4L + Option(r.getAs[String](c)).map(_.length.toLong).getOrElse(0L)
        }.sum
      }.sum
      val (nr, bytes, avg, ok) = got(name)
      assert(nr == rows.length.toLong, s"$name n_rows")
      assert(bytes == est, s"$name est_bytes")
      assert(math.abs(avg - est.toDouble / rows.length) <= 0.005 + 1e-9, s"$name avg")
      assert(ok == (est <= Profiling.BroadcastThreshold), s"$name broadcast_ok")
    }
    // at the gate SFs everything audited is under threshold (the flag
    // logic is pinned per table above: ok == est <= threshold, with
    // est recomputed driver-side — a sign flip fails there); the small
    // dims must broadcast at ANY scale
    assert(got("region")._4 && got("nation")._4, "small dims must broadcast")
  }

  test("q_join_plan derives its decisions from the shared size estimator") {
    import graft.operators.Profiling
    import org.apache.spark.sql.types._
    val t = graft.core.Tables(spark, sf)
    val widths = Profiling.TableWidths.toMap
    // lineitem is the one TableWidths entry the audit test doesn't
    // drift-guard — pin it here
    val liCols = widths("lineitem")
    val byName = t.table("lineitem").schema.fields
      .map(f => f.name -> f.dataType).toMap
    assert(byName.keySet == liCols.map(_._1).toSet, "lineitem columns drifted")
    liCols.foreach { case (c, kind) =>
      val ok = (kind, byName(c)) match {
        case ("fixed4", IntegerType) => true
        case ("fixed8", LongType | DoubleType | TimestampType |
                        TimestampNTZType) => true
        case ("string", StringType) => true
        case _ => false
      }
      assert(ok, s"lineitem.$c: kind $kind vs actual ${byName(c)}")
    }
    def est(name: String): (Long, Long) = {
      val cols = widths(name)
      val rows = t.table(name).collect()
      val bytes = rows.map { r =>
        cols.map {
          case (_, "fixed4") => 4L
          case (_, "fixed8") => 8L
          case (c, _) =>
            4L + Option(r.getAs[String](c)).map(_.length.toLong).getOrElse(0L)
        }.sum
      }.sum
      (rows.length.toLong, bytes)
    }
    val got = Profiling.qJoinPlan(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getLong(6))).toMap
    assert(got.keySet == Profiling.PlanJoins.map(_._1).toSet)
    Profiling.PlanJoins.foreach { case (n, f, d) =>
      val (fr, fb) = est(f)
      val (dr, db) = est(d)
      val (gfr, gfb, gdr, gdb, ok, shuf) = got(n)
      assert(gfr == fr && gfb == fb, s"$n fact stats")
      assert(gdr == dr && gdb == db, s"$n dim stats")
      assert(ok == (db <= Profiling.BroadcastThreshold), s"$n broadcast flag")
      assert(shuf == (if (ok) 0L else fb + db), s"$n shuffle bytes")
    }
  }

  test("q_agg_plan: combine model matches a driver-side recompute per candidate key") {
    import graft.operators.Profiling
    val t = graft.core.Tables(spark, sf)
    val got = Profiling.qAggPlan(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5))).toMap
    assert(got.keySet == Profiling.PlanAggs.map(_._1).toSet)
    Profiling.PlanAggs.foreach { case (name, tbl, key) =>
      val rows = t.table(tbl).select(key).collect().map(_.get(0))
      val (n, ndv) = (rows.length.toLong, rows.distinct.length.toLong)
      val out = math.min(n, ndv * Profiling.CombineModelTasks)
      val (gn, gndv, gout, gGain, gEff) = got(name)
      assert(gn == n && gndv == ndv, s"$name stats: got ($gn,$gndv) want ($n,$ndv)")
      assert(gout == out, s"$name combine_out_rows")
      assert(gGain == math.floor(n.toDouble / out * 100 + 0.5) / 100, s"$name gain")
      assert(gEff == (out * 4 <= n), s"$name effective flag")
    }
    // the candidate set spans the regimes the report exists to show:
    // a collapsing key (combine effective) AND a near-unique one (not)
    assert(got.values.exists(_._5) && got.values.exists(!_._5),
      s"fixture must exercise both combine regimes: $got")
  }

  test("e_outliers: planted far vector flags; corpus run matches driver recompute") {
    import SparkSpec.spark.implicits._
    import graft.operators.Embeddings
    // 9 clustered vectors near (1,0) + 1 planted far vector: the far
    // one must flag, the cluster must not, and every number matches a
    // hand recompute of dist²/mean/ratio
    val vecs = (0 until 9).map(i =>
      (i.toLong, Seq(1.0f + i * 0.01f, 0.0f), 0)) :+ (9L, Seq(10.0f, 10.0f), 0)
    val e = vecs.toDF("vec_id", "embedding", "label")
    val got = Embeddings.outliersOf(spark, e).collect()
      .map(r => r.getLong(1) -> (r.getDouble(2), r.getDouble(4), r.getBoolean(5)))
      .toMap
    // driver recompute (plain doubles; rounding matches stableRound)
    val xs = vecs.map(_._2.map(_.toDouble))
    val c = Seq(0, 1).map(d => xs.map(_(d)).sum / xs.size)
    val d2 = xs.map(x => x.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
    val mean = d2.sum / d2.size
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    vecs.indices.foreach { i =>
      val (gd2, gratio, gflag) = got(i.toLong)
      assert(math.abs(gd2 - r6(d2(i))) < 1e-9, s"vec $i dist2: $gd2 vs ${d2(i)}")
      assert(math.abs(gratio - math.floor(d2(i) / mean * 1e4 + 0.5) / 1e4) < 1e-9)
      assert(gflag == (d2(i) > mean * Embeddings.OutlierFactor), s"vec $i flag")
    }
    assert(got(9L)._3 && !got(0L)._3,
      "planted outlier must flag and the cluster must not")
    // the corpus run stays flag-false but ratio-substantive (the
    // documented gate-SF regime) — guard that assumption visibly
    val corpus = Embeddings.eOutliers(spark, sf).collect()
    assert(corpus.nonEmpty && corpus.forall(!_.getBoolean(5)))
    assert(corpus.map(_.getDouble(4)).max > 1.0, "ratio column degenerate")
  }

  test("d_ldiv: internally consistent and the fixture spans both diversity regimes") {
    import graft.operators.Pii
    val rows = Pii.dLdiv(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getDouble(4),
        r.getBoolean(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (size, ns, share, ldiv, homog) =>
      assert(ns >= 1 && ns <= size, s"distinct count out of range: ($size,$ns)")
      // the dominant value's share is at least the uniform share and ≤ 1
      assert(share >= 1.0 / ns - 1e-9 && share <= 1.0, s"share $share of $ns")
      assert(ldiv == (ns >= Pii.LDiv) && homog == (ns == 1L), "flag consistency")
    }
    assert(rows.exists(_._4) && rows.exists(!_._4),
      "fixture must exercise BOTH l-diverse and failing classes")
  }

  test("q_skew_audit matches a driver-side recompute of every column's heavy hitters") {
    import graft.operators.Profiling
    val got = Profiling.qSkewAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    val li = graft.core.Tables(spark, sf).lineitem
      .selectExpr(Profiling.SkewCols.map(c => s"cast($c as bigint) as $c"): _*)
      .collect()
    Profiling.SkewCols.zipWithIndex.foreach { case (c, i) =>
      val counts = li.map(_.getLong(i)).groupBy(identity)
        .map { case (k, vs) => k -> vs.length.toLong }
      val nRows = li.length.toLong
      val ndv = counts.size.toLong
      val want = counts.toSeq.sortBy { case (k, n) => (-n, k) }
        .take(Profiling.SkewTopK)
      val rows = got.filter(_._1 == c)
      assert(rows.length == Profiling.SkewTopK)
      rows.zip(want).foreach { case ((_, key, cnt, nr, nd, share, skew), (wk, wc)) =>
        assert(key == wk && cnt == wc && nr == nRows && nd == ndv,
          s"$c: got ($key,$cnt,$nr,$nd) want ($wk,$wc,$nRows,$ndv)")
        assert(math.abs(share - cnt.toDouble / nRows) < 1e-6)
        assert(math.abs(skew - cnt.toDouble * ndv / nRows) < 1e-4)
        assert(skew >= 0.999, s"a top key cannot be below the uniform mean: $skew")
      }
    }
  }

  test("d_mix_plan realizes its targets: repeat factors invert the measured mix") {
    import graft.operators.Curation
    val rows = Curation.dMixPlan(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getBoolean(6), r.getLong(7)))
    val total = rows.map(_._2).sum
    val named = Curation.MixPlanTargetsBps.toMap
    rows.foreach { case (src, n, nat, tgt, raw, w, capped, exp) =>
      assert(math.abs(nat - n.toDouble / total) < 1e-6, s"$src nat_share")
      named.get(src).foreach(bps =>
        assert(math.abs(tgt - bps / 10000.0) < 1e-6, s"$src target"))
      // the factor inverts the mix: repeating n_tokens w times yields
      // the target share of the ORIGINAL total (pre-cap)
      assert(math.abs(raw - tgt * total / n) < 1e-3, s"$src repeat_raw")
      assert(w == math.min(raw, Curation.MixPlanMaxRepeat), s"$src cap")
      assert(capped == (raw > Curation.MixPlanMaxRepeat), s"$src capped flag")
      assert(exp == math.floor(w * n + 0.5).toLong, s"$src expected_tokens")
    }
    // target shares are a partition of 1 (named + even remainder)
    val tgtSum = rows.map(_._4).sum
    assert(math.abs(tgtSum - 1.0) < 1e-4, s"target shares sum to $tgtSum")
  }

  test("m_phash: banding reproduces the exact hamming-ball pair set") {
    import graft.multimodal.Multimodal
    // independent driver reference: re-derive every signature from the
    // raw text and brute-force ALL pairs — banding must be exactly the
    // hamming ≤ K ball (pigeonhole completeness) with exact distances
    val docs = graft.core.Tables(spark, sf).documents
      .select("doc_id", "text").as[(Long, String)].collect()
    val sigs = docs.flatMap { case (id, text) =>
      val norm = text.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .replaceAll(" +", " ").trim
      val bins = norm.split(" ", -1).map(w =>
        java.lang.Long.parseLong(md5Hex(w).substring(0, 8), 16) % Multimodal.PhashBins)
      val tot = bins.length.toLong
      if (tot < Multimodal.PhashMinFeatures) None
      else {
        val h = new Array[Long](Multimodal.PhashBins)
        bins.foreach(b => h(b.toInt) += 1L)
        val bands = Array.tabulate(4) { b =>
          (0 until 16).map(i => if (h(16 * b + i) * 64 > tot) 1L << i else 0L).sum
        }
        Some(id -> bands)
      }
    }
    val expected = (for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
      (idA, sa) = sigs(i); (idB, sb) = sigs(j)
      ham = (0 until 4).map(b => java.lang.Long.bitCount(sa(b) ^ sb(b))).sum
      if ham <= graft.operators.Dedup.HammingK
    } yield {
      val (lo, hi) = if (idA < idB) (idA, idB) else (idB, idA)
      (lo, hi, ham.toLong)
    }).toSet
    val got = Multimodal.mPhash(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(expected.nonEmpty, "fixture degenerate: no near-dup pairs at all")
    assert(got == expected,
      s"banding diverged from the exact hamming ball: " +
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("e_silhouette: matches a driver recompute of simplified silhouette") {
    import graft.operators.Embeddings
    val rows = graft.core.Tables(spark, sf).embeddings
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val byLabel = rows.groupBy(_._2)
    val cents = byLabel.map { case (l, vs) =>
      val d = vs.head._3.length
      l -> Array.tabulate(d)(i => vs.map(_._3(i)).sum / vs.length)
    }
    def dist(x: Array[Double], c: Array[Double]): Double =
      math.sqrt(x.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
    val want = byLabel.map { case (l, vs) =>
      val ss = vs.map { case (_, _, x) =>
        val a = dist(x, cents(l))
        val b = cents.collect { case (m, c) if m != l => dist(x, c) }.min
        if (math.max(a, b) > 0) (b - a) / math.max(a, b) else 0.0
      }
      l -> (vs.length.toLong, ss.sum / ss.size)
    }
    val got = Embeddings.eSilhouette(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSet == want.keySet)
    got.foreach { case (l, n, s) =>
      assert(n == want(l)._1, s"label $l count")
      // driver recompute is float-noisy (unpinned order); the oracle
      // carries the bit-exact check — here a tight band suffices
      assert(math.abs(s - want(l)._2) < 1e-6, s"label $l: $s vs ${want(l)._2}")
      assert(s >= -1.0 && s <= 1.0)
    }
    // the corpus records the NEGATIVE diagnostic: the label column is
    // not an embedding clustering, so coherence sits at ≈ 0 — exactly
    // the "don't scope dedup by this column" answer the gate is for
    assert(got.map(_._3).forall(s => math.abs(s) < 0.05),
      s"random labels should score ≈ 0 (${got.mkString(", ")})")
  }

  test("e_silhouette: separated synthetic clusters score near 1, mixed labels near 0") {
    import graft.operators.Embeddings
    // 3 tight clusters far apart: coherent labels → s ≈ 1 for all
    val base = Map(0 -> Array(10f, 0f, 0f), 1 -> Array(0f, 10f, 0f), 2 -> Array(0f, 0f, 10f))
    val rows = (0 until 60).map { i =>
      val l = i % 3
      val x = base(l).clone()
      x(i % x.length) += (i % 5) * 0.01f // small deterministic jitter
      (i.toLong, l, x.toSeq)
    }
    val df = rows.toDF("vec_id", "label", "embedding")
    val good = Embeddings.silhouetteOf(spark, df).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(good.keySet == Set(0, 1, 2))
    assert(good.values.forall(_ > 0.9), s"separated clusters must score near 1: $good")
    // the same points with labels decoupled from position (blocks of
    // 20 ids, each spanning all three position clusters) → ≈ 0 or worse
    val mixed = rows.map { case (id, _, x) => (id, (id / 20L).toInt, x) }
      .toDF("vec_id", "label", "embedding")
    val bad = Embeddings.silhouetteOf(spark, mixed).collect().map(_.getDouble(2))
    assert(bad.forall(_ < 0.5), s"decoupled labels must not look coherent: ${bad.toSeq}")
    // degenerate single-label input: b has no "other" centroid — the
    // operator must report the no-structure 0, not crash on the null
    val one = rows.map { case (id, _, x) => (id, 7, x) }
      .toDF("vec_id", "label", "embedding")
    val single = Embeddings.silhouetteOf(spark, one).collect()
    assert(single.length == 1 && single.head.getDouble(2) == 0.0,
      s"single-label silhouette must be 0: ${single.toSeq}")
  }

  test("m_phash_eval reconciles with the verified pair set; recall is structural") {
    import graft.multimodal.Multimodal
    val ev = Multimodal.mPhashEval(spark, sf).head()
    val nPairs = Multimodal.mPhash(spark, sf).count()
    // n_pairs is exactly the m_phash output (the verified pairs); the
    // m_phash brute-force test pins output == the exact hamming ball,
    // so fn = 0 (the pigeonhole theorem) follows from these two
    assert(ev.getAs[Long]("n_pairs") == nPairs)
    val nCand = ev.getAs[Long]("n_cand")
    assert(nCand >= nPairs && ev.getAs[Long]("fp") == nCand - nPairs)
    assert(ev.getAs[Double]("precision") ==
      math.floor(nPairs.toDouble / nCand * 1e6 + 0.5) / 1e6)
  }

  test("retrieval eval rollups partition the same pair set (source vs lang totals)") {
    import graft.operators.Retrieval
    def totals(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
      df.collect().groupBy(_.getString(0)).map { case (arm, rows) =>
        arm -> (rows.map(_.getAs[Long]("n_pairs")).sum,
          rows.map(_.getAs[Long]("hits")).sum)
      }
    val pooled = totals(Retrieval.tRetrievalEval(spark, sf))
    val byLang = totals(Retrieval.tRetrievalEvalSeg(spark, sf))
    assert(pooled.keySet == Set("lex", "vec") && byLang.keySet == pooled.keySet)
    // both groupings partition the identical (arm, q, d) pair set
    assert(pooled == byLang, s"rollup totals diverge: $pooled vs $byLang")
    // per-row rate formula
    Retrieval.tRetrievalEvalSeg(spark, sf).collect().foreach { r =>
      assert(r.getAs[Double]("hit_rate") ==
        math.floor(r.getAs[Long]("hits").toDouble /
          r.getAs[Long]("n_pairs") * 1e6 + 0.5) / 1e6)
    }
  }

  test("d_datacard reconciles with a driver rollup of its input frames") {
    val src = graft.core.Tables(spark, sf).documents
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val audit = Curation.dAudit(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(3))).toMap
    val qm = TextAnalysis.qualityMetrics(spark, sf)
      .select("doc_id", "n_words", "quality").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val lang = TextAnalysis.langPredictions(spark, sf)
      .select("doc_id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bySrc = src.keys.toSeq.groupBy(src)
    val got = Curation.dDatacard(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == bySrc.keySet)
    bySrc.foreach { case (s, ids) =>
      val r = got(s)
      assert(r.getAs[Long]("n_docs") == ids.size.toLong, s"$s n_docs")
      assert(r.getAs[Long]("n_tokens") == ids.map(qm(_)._1).sum, s"$s n_tokens")
      val kept = ids.count(audit(_)._1).toLong
      assert(r.getAs[Long]("n_kept") == kept, s"$s n_kept")
      assert(r.getAs[Double]("pct_kept") ==
        math.floor(kept.toDouble / ids.size * 1e4 + 0.5) / 1e4, s"$s pct_kept")
      assert(r.getAs[Long]("n_pii_scrub") == ids.count(audit(_)._2).toLong)
      // modal lang with the documented count-desc-then-lexicographic
      // tie-break, recomputed independently
      val (wantLang, wantN) = ids.groupBy(lang).view.mapValues(_.size)
        .toSeq.minBy { case (l, n) => (-n, l) }
      assert(r.getAs[String]("top_lang") == wantLang, s"$s top_lang")
      assert(r.getAs[Long]("top_lang_n") == wantN.toLong, s"$s top_lang_n")
      // mean folds the sorted per-doc scores — replaying the same
      // order makes the double exact, not approximate
      val folded = ids.map(qm(_)._2).sorted.foldLeft(0.0)(_ + _)
      assert(r.getAs[Double]("mean_quality") ==
        math.floor(folded / ids.size * 1e4 + 0.5) / 1e4, s"$s mean_quality")
    }
  }

  test("d_ppl_bucket: terciles are ntile of the logprob ranking, partition-invariant") {
    val scored = TextAnalysis.tLogprob(spark, sf)
      .select("doc_id", "logprob10").as[(Long, Double)].collect()
    val n = scored.length
    assert(n > 0)
    val expected = scored.sortBy { case (id, lp) => (-lp, id) }
      .zipWithIndex.map { case ((id, lp), pos) =>
        (id, lp, pos.toLong * Curation.PplBuckets / n + 1L)
      }.toSet
    val got = Curation.dPplBucket(spark, sf)
      .select("doc_id", "logprob10", "bucket_idx")
      .as[(Long, Double, Long)].collect()
    assert(got.toSet == expected, "bucket assignment diverged from the driver rank")
    // bucket sizes: ntile semantics — earlier buckets take the
    // remainder, sizes differ by at most one
    val sizes = got.groupBy(_._3).toSeq.sortBy(_._1).map(_._2.length)
    assert(sizes.length == Curation.PplBuckets)
    assert(sizes.max - sizes.min <= 1 && sizes == sizes.sorted.reverse,
      s"not an ntile split: $sizes")
    // the distributed two-pass rank must not depend on the partition
    // count (range boundaries move; buckets must not)
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val again = Curation.dPplBucket(spark, sf)
        .select("doc_id", "logprob10", "bucket_idx")
        .as[(Long, Double, Long)].collect()
      assert(again.toSet == got.toSet, "buckets changed with partition count")
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }

  test("e_drift: a one-sided label reports loudly, never silently drops") {
    // label 1 lives in both vec_id-parity snapshots; label 2 only in
    // the even half — the appearance/disappearance event the monitor
    // exists to catch must surface as a row, not vanish in the join
    val e = Seq(
      (0L, Seq(1.0f, 0.0f), 1), (1L, Seq(0.0f, 1.0f), 1),
      (2L, Seq(3.0f, 4.0f), 2), (4L, Seq(3.0f, 4.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val got = graft.operators.Embeddings.eDriftOf(spark, e)
      .as[(Int, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got.keySet == Set(1, 2), s"labels missing from the report: $got")
    // label 2: present only in snapshot A — n_b = 0, drift = the
    // prototype's own norm (5.0), cosine 0 via the zero-norm guard
    assert(got(2) == ((2L, 0L, 5.0, 0.0)), s"one-sided label row: ${got(2)}")
    // label 1: one unit vector per half — l2 = sqrt(2), cos = 0
    assert(got(1)._1 == 1L && got(1)._2 == 1L)
    assert(math.abs(got(1)._3 - math.sqrt(2.0)) < 1e-6)
  }

  test("d_dedup_url: aliases collapse onto their base fetch; keeps are exact") {
    val rows = graft.operators.WebCuration.dDedupUrl(spark, sf)
      .select("fetch_id", "doc_id", "url", "canon_url", "n_aliases", "keep")
      .as[(Long, Long, String, String, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    // canonicalization recomputed driver-side from the raw url
    rows.foreach { case (_, _, url, canon, _, _) =>
      val want = url.replaceAll("\\?.*$", "")
        .replaceAll("^https://www\\.", "https://").replaceAll("/$", "")
      assert(canon == want, s"canon of $url")
      assert(!canon.contains("?") && !canon.contains("www."))
    }
    // exactly one keep per canonical group; keep is the min fetch_id;
    // n_aliases is the true group size
    rows.groupBy(_._4).foreach { case (canon, g) =>
      assert(g.count(_._6) == 1, s"$canon keeps")
      assert(g.filter(_._6).head._1 == g.map(_._1).min, s"$canon keeper")
      assert(g.forall(_._5 == g.length.toLong), s"$canon group size")
    }
    // the alias shim must generate real dup groups (~half the docs),
    // and every alias variant carries the tracking param it collapses
    val aliases = rows.filter(r => r._1 % 2 == 1)
    assert(aliases.nonEmpty && aliases.forall(_._3.contains("utm_source=feed")))
    val groupSize = rows.groupBy(_._4).map { case (c, g) => c -> g.length }
    assert(aliases.forall(a => groupSize(a._4) >= 2),
      "every alias must land in a multi-fetch canonical group")
    // and an alias never outranks its base fetch (base id is smaller)
    assert(aliases.forall(!_._6), "alias fetches must never be the keeper")
  }
}
