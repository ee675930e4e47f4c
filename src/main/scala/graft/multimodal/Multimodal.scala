package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Multimodal column plumbing: media treated as opaque `binary`
  * payloads with typed metadata, decoded batch-wise inside partitions.
  *
  * The decode step itself is a STUB — this container has no
  * image/audio codecs — but it is a *deterministic* stub (features
  * derived from the payload md5), so the full pipeline stays
  * oracle-checkable end to end. Everything around the stub is the real
  * production shape: binary column in, `mapPartitions` batch decode
  * (the Scala analog of an Arrow-batched Python decode), typed
  * feature schema out, narrow (shuffle-free) execution. A real decoder
  * drops into [[decodeStub]] without touching the plumbing.
  */
object Multimodal {

  /** Typed output schema of the decode stage. */
  final case class DecodedMedia(
      doc_id: Long,
      n_bytes: Long,
      fmt: String,
      width: Long,
      height: Long,
      channels: Long,
      payload_md5: String)

  private def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  /** STUB decoder: a real implementation would parse the payload with
    * a codec; this derives deterministic fake dimensions from the
    * payload hash so values are reproducible in any engine. */
  def decodeStub(docId: Long, payload: Array[Byte]): DecodedMedia = {
    val hex = md5Hex(payload)
    val h = java.lang.Long.parseLong(hex.substring(0, 8), 16)
    DecodedMedia(
      doc_id = docId,
      n_bytes = payload.length.toLong,
      fmt = "text/plain",
      width = h % 640,
      height = h % 480,
      channels = 3L,
      payload_md5 = hex)
  }

  /** Batch decode over a binary column: per-partition iteration (no
    * per-row task overhead, no shuffle), binary payload in, typed
    * features out. */
  def decodeBatch(spark: SparkSession, payloads: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
  }

  /** The registered query: documents' text re-encoded as the binary
    * payload column (standing in for real media bytes), decoded to the
    * typed feature schema. */
  def mBinaryMeta(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val payloads = d.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    decodeBatch(spark, payloads).toDF().orderBy("doc_id")
  }

  val mBinaryMetaSql: String =
    """SELECT doc_id,
      |  octet_length(encode(text))::BIGINT AS n_bytes,
      |  'text/plain' AS fmt,
      |  ('0x' || substr(md5(text), 1, 8))::BIGINT % 640 AS width,
      |  ('0x' || substr(md5(text), 1, 8))::BIGINT % 480 AS height,
      |  3::BIGINT AS channels,
      |  md5(text) AS payload_md5
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Frame-sampling stride/length (in bytes of the payload). */
  val FrameStride = 64
  val FrameLen = 32

  /** Frame sampling over the payload: every FrameStride bytes, take a
    * FrameLen slice and emit (frame_idx, byte offset, length, md5) —
    * the shape of sampling keyframes out of a video/audio payload.
    * The test payload is ASCII text, so character slicing ≡ byte
    * slicing and the DuckDB oracle replays it exactly; a real media
    * payload would swap the slice for a codec-aware reader without
    * touching the schema or distribution shape (explode is a narrow
    * op — no shuffle). */
  def mFrameSample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    // empty payloads emit NO frames: Spark's sequence(0, -1) would
    // auto-step DOWN ([0, -1]) while the oracle's range(0, 0) is
    // empty — the filter pins both engines to the same answer
    d.filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          floor((length(col("text")) - 1) / FrameStride).cast("int"))).as("frame_idx"))
      .select(
        col("doc_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        (col("frame_idx") * FrameStride).cast("long").as("frame_offset"),
        length(substr(col("text"), col("frame_idx") * FrameStride + 1, lit(FrameLen)))
          .cast("long").as("frame_bytes"),
        md5(substr(col("text"), col("frame_idx") * FrameStride + 1, lit(FrameLen)))
          .as("frame_md5"))
      .orderBy("doc_id", "frame_idx")
  }

  val mFrameSampleSql: String =
    s"""SELECT doc_id, i AS frame_idx, i * $FrameStride AS frame_offset,
       |  length(substr(text, (i * $FrameStride + 1)::BIGINT, $FrameLen))::BIGINT AS frame_bytes,
       |  md5(substr(text, (i * $FrameStride + 1)::BIGINT, $FrameLen)) AS frame_md5
       |FROM documents
       |CROSS JOIN (SELECT unnest(range(
       |    (SELECT (max(length(text)) - 1) // $FrameStride + 1 FROM documents))) AS i) ii
       |WHERE i <= (length(text) - 1) // $FrameStride
       |ORDER BY doc_id, frame_idx""".stripMargin

  /** Typed output schema of the resize stage. */
  final case class ResizedMedia(
      doc_id: Long,
      orig_bytes: Long,
      resized_bytes: Long,
      resized_md5: String)

  /** STUB resize: a real implementation would decode, scale, and
    * re-encode; this takes every 2nd payload byte (a deterministic
    * ½-"downsample" any engine can replay). Byte striding ≡ the
    * oracle's character striding ONLY for ASCII payloads — any byte ≥
    * 0x80 would make the two silently diverge (a multi-byte UTF-8 char
    * is one oracle stride step but several byte steps), so non-ASCII
    * input fails loudly here instead of hash-mismatching downstream. */
  def resizeStub(docId: Long, payload: Array[Byte]): ResizedMedia = {
    var i = 0
    while (i < payload.length) {
      require(payload(i) >= 0,
        s"resizeStub: non-ASCII byte 0x${(payload(i) & 0xff).toHexString} at " +
          s"offset $i of doc $docId — byte striding diverges from the " +
          "char-striding oracle outside ASCII; decode-aware resize needed")
      i += 1
    }
    val out = Array.tabulate((payload.length + 1) / 2)(i => payload(2 * i))
    ResizedMedia(docId, payload.length.toLong, out.length.toLong, md5Hex(out))
  }

  /** Batch "resize" over the binary payload column — same production
    * shape as [[decodeBatch]]: binary in, per-partition batch
    * transform (where a real codec pipeline amortizes decoder init
    * across the partition), typed schema out, no shuffle. */
  def mResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables(spark, dir).documents
    d.select(col("doc_id").cast("long"), encode(col("text"), "UTF-8").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => resizeStub(id, bytes) })
      .toDF().orderBy("doc_id")
  }

  val mResizeSql: String =
    """SELECT doc_id,
      |  octet_length(encode(text))::BIGINT AS orig_bytes,
      |  ((length(text) + 1) // 2)::BIGINT AS resized_bytes,
      |  md5(array_to_string([text[i] for i in range(1, length(text) + 1, 2)], '')) AS resized_md5
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Shard byte budget for [[mShardPack]]. */
  val ShardBytes = 65536L

  /** m_shard_pack — WebDataset-style media shard assignment: payloads
    * in doc_id order are laid head-to-tail into fixed
    * [[ShardBytes]]-byte shards, emitting each payload's shard id and
    * in-shard byte offset — the manifest a sequential shard writer (or
    * a ranged reader) needs, computed before any bytes move. Reuses
    * the distributed two-pass prefix sum behind tPack
    * ([[graft.operators.TextAnalysis.budgetPack]]) over payload BYTE
    * lengths — never a global ORDER BY window, which would pull the
    * corpus into one reducer. */
  def mShardPack(spark: SparkSession, dir: String): DataFrame = {
    val sized = Tables(spark, dir).documents
      .select(col("doc_id"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
    graft.operators.TextAnalysis.budgetPack(spark, sized, ShardBytes)
      .select(col("id").as("doc_id"), col("n").as("n_bytes"),
        col("bucket").as("shard_id"), col("off").as("offset_bytes"))
      .orderBy("doc_id")
  }

  val mShardPackSql: String =
    s"""SELECT doc_id, n_bytes,
       |  cumb // $ShardBytes AS shard_id, cumb % $ShardBytes AS offset_bytes
       |FROM (
       |  SELECT doc_id, n_bytes,
       |    coalesce(sum(n_bytes) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cumb
       |  FROM (SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes
       |        FROM documents) w) t
       |ORDER BY doc_id""".stripMargin

  /** Negative-sample offset for [[mCaptionPair]] — a fixed stride far
    * from 0 so the negative is never the positive (stride < corpus
    * size at every sf) yet fully deterministic. */
  val NegStride = 173L

  /** m_caption_pair — contrastive (caption, positive, negative)
    * training-pair construction, the CLIP-style multimodal batch
    * builder: each document's caption pairs with its aligned
    * embedding (the "image" side of the synthetic corpus) and a
    * deterministic stride-offset negative, scored with the cosine
    * between positive and negative — the hardness signal curriculum /
    * hard-negative schedulers sort on.
    *
    * Scale shape: two EQUI-joins on the id key (co-partitioned under
    * an id-bucketed layout — zero extra shuffle; otherwise one hash
    * exchange each), and the negative is ARITHMETIC (id + stride mod
    * n) — no sampling shuffle, no RNG. In production the stride
    * negative is the cheap tier; mined hard negatives come from the
    * ANN tiers ([[graft.operators.Similarity]]) feeding the same
    * (doc, pos, neg) schema. Cosine parity: both dots fold
    * ascending-dim from 0.0 ([[graft.functions.expr.VectorExpressions]]
    * DotProduct ≡ list_reduce), sqrt//·/ are correctly-rounded IEEE —
    * bit-identical, no rounding step. */
  def mCaptionPair(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity.dot
    val t = Tables(spark, dir)
    val n = t.embeddings.count()
    val docs = t.documents.select(col("doc_id"), md5(col("text")).as("caption_md5"))
    val pos = t.embeddings.select(col("vec_id").as("pos_vec_id"),
      col("embedding").as("pos_emb"))
    val neg = t.embeddings.select(col("vec_id").as("neg_vec_id"),
      col("embedding").as("neg_emb"))
    docs.join(pos, col("doc_id") === col("pos_vec_id"))
      .withColumn("neg_vec_id", pmod(col("doc_id") + lit(NegStride), lit(n)))
      .join(neg, "neg_vec_id")
      .select(col("doc_id"), col("caption_md5"), col("pos_vec_id"),
        col("neg_vec_id"),
        (dot(col("pos_emb"), col("neg_emb")) /
          (sqrt(dot(col("pos_emb"), col("pos_emb"))) *
            sqrt(dot(col("neg_emb"), col("neg_emb"))))).as("hardness"))
      .orderBy("doc_id")
  }

  val mCaptionPairSql: String = {
    def dotSql(a: String, b: String): String =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1), " +
        s"i -> $a[i]::DOUBLE * $b[i]::DOUBLE)), (x, y) -> x + y)"
    s"""WITH nn AS (SELECT count(*) AS n FROM embeddings),
       |d AS (SELECT doc_id, md5(text) AS caption_md5 FROM documents),
       |p AS (
       |  SELECT d.doc_id, d.caption_md5, e.vec_id AS pos_vec_id,
       |    e.embedding AS pe,
       |    (d.doc_id + $NegStride) % (SELECT n FROM nn) AS neg_vec_id
       |  FROM d JOIN embeddings e ON e.vec_id = d.doc_id)
       |SELECT p.doc_id, p.caption_md5, p.pos_vec_id, p.neg_vec_id,
       |  ${dotSql("pe", "ne")} /
       |    (sqrt(${dotSql("pe", "pe")}) * sqrt(${dotSql("ne", "ne")})) AS hardness
       |FROM (SELECT p.*, e2.embedding AS ne
       |      FROM p JOIN embeddings e2 ON e2.vec_id = p.neg_vec_id) p
       |ORDER BY doc_id""".stripMargin
  }

  /** Scene-change threshold on the adjacent-frame edit distance
    * (frames are [[FrameLen]] units long; measured adjacent-frame
    * distances on the synthetic payloads span 15-32, mean ~26, so 27
    * yields multi-frame scenes without degenerating to
    * one-scene-per-frame). */
  val SceneTau = 27

  /** m_video_scene — scene segmentation over a media payload (the
    * shot-boundary split a video pipeline runs before captioning or
    * frame dedup): strided frames ([[mFrameSample]]'s grid), a scene
    * boundary wherever the edit distance to the PREVIOUS frame
    * reaches [[SceneTau]] (both engines implement classic Levenshtein
    * — identical integers), scenes numbered by running boundary count,
    * one row per scene with its start frame, length, and keyframe
    * fingerprint. The real-codec swap changes the frame reader and
    * the distance (histogram/SSIM), not the schema or the shape: ONE
    * doc-keyed shuffle shared by the lag window, the scene-id running
    * sum, and the per-scene aggregate. */
  def mVideoScene(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables(spark, dir).documents
    val frame = substr(col("text"), col("frame_idx") * FrameStride + 1, lit(FrameLen))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    // same empty-payload guard as [[mFrameSample]] — sequence(0, -1)
    // steps down where the oracle's range is empty
    val frames = d.filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          floor((length(col("text")) - 1) / FrameStride).cast("int"))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        frame.as("frame"))
    frames
      .withColumn("dist", levenshtein(col("frame"),
        lag(col("frame"), 1).over(byDoc)))
      .withColumn("boundary",
        (col("dist").isNull || col("dist") >= SceneTau).cast("long"))
      .withColumn("scene_id",
        sum(col("boundary")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)) - 1L)
      .groupBy("doc_id", "scene_id")
      .agg(min(col("frame_idx")).as("start_frame"),
        count(lit(1)).as("n_frames"),
        min(struct(col("frame_idx").as("i"), col("frame").as("f"))).as("kf"))
      .select(col("doc_id"), col("scene_id"), col("start_frame"),
        col("n_frames"), md5(col("kf.f")).as("keyframe_md5"))
      .orderBy("doc_id", "scene_id")
  }

  val mVideoSceneSql: String =
    s"""WITH f AS (
       |  SELECT doc_id, i::BIGINT AS frame_idx,
       |    substr(text, (i * $FrameStride + 1)::BIGINT, $FrameLen) AS frame
       |  FROM documents, unnest(range(0, 1 + (length(text) - 1) // $FrameStride)) t(i)),
       |b AS (
       |  SELECT doc_id, frame_idx, frame,
       |    CASE WHEN lag(frame) OVER (PARTITION BY doc_id ORDER BY frame_idx) IS NULL
       |              OR levenshtein(frame,
       |                   lag(frame) OVER (PARTITION BY doc_id ORDER BY frame_idx)) >= $SceneTau
       |         THEN 1 ELSE 0 END AS boundary
       |  FROM f),
       |s AS (
       |  SELECT doc_id, frame_idx, frame,
       |    (sum(boundary) OVER (PARTITION BY doc_id ORDER BY frame_idx
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)::BIGINT AS scene_id
       |  FROM b)
       |SELECT doc_id, scene_id, min(frame_idx)::BIGINT AS start_frame,
       |  count(*)::BIGINT AS n_frames, md5(arg_min(frame, frame_idx)) AS keyframe_md5
       |FROM s GROUP BY doc_id, scene_id
       |ORDER BY doc_id, scene_id""".stripMargin

  /** Number of feature bins in the [[mPhash]] perceptual hash (one
    * hash bit per bin). */
  val PhashBins = 64

  /** Minimum decoded-feature count for a payload to participate in
    * [[mPhash]] banding: a near-empty payload has a near-zero
    * histogram whose bands are ALL zero, so the whole class piles
    * into the same four buckets. This filter removes that degenerate
    * population (mirrored in the oracle); it does NOT eliminate
    * zero-valued bands entirely — any doc whose tokens simply never
    * hash into one band's 16 bins contributes a (band, 0) row
    * (P ≈ (48/64)^n for n distinct tokens, ~10% at n=8, vanishing
    * for normal documents), and those rows cannot be dropped without
    * losing recall (a pair's only intact band may be the zero band).
    * The residual (band, 0) bucket is the banding join's skew case —
    * AQE skew-join splitting territory, bounded by that population's
    * square, same class as the salt-explode joins elsewhere. */
  val PhashMinFeatures = 8

  /** m_phash — perceptual-hash near-duplicate pairs over the binary
    * media column: the image-dedup stage of a multimodal pipeline
    * (LAION-style corpora dedup images by pHash before training).
    * The real-codec pipeline decodes the payload to a feature
    * histogram (luminance patches, color moments); this container has
    * no codecs, so the STUB feature extractor tokenizes the decoded
    * payload and buckets token hashes into [[PhashBins]] bins — a
    * deterministic, engine-replayable histogram with the same
    * locality property (near-identical payloads → near-identical
    * histograms). Everything downstream is the production shape:
    *
    *  1. average-hash bits: bit_i = hist_i > mean(hist), computed as
    *     the pure-integer `hist_i * 64 > total` (no float appears
    *     anywhere in the operator — exact parity by construction);
    *  2. the 64-bit signature lives as 4 × 16-bit band values (never
    *     one BIGINT, so no sign-bit/shift-semantics hazards);
    *  3. banding generates candidates — exact equality on any 16-bit
    *     band, pigeonhole-complete for hamming ≤ [[graft.operators.Dedup.HammingK]]
    *     (4 bands, ≤ 3 flipped bits leave ≥ 1 band intact);
    *  4. exact verification: Σ_b bit_count(xor) ≤ K.
    *
    * Distribution: the signature is computed in a NARROW map (the
    * histogram folds over the materialized bin array per row — no
    * explode, no (doc, bin) shuffle), so the only exchanges are the
    * banding self-join's hash partitioning on (band, value) — linear
    * in corpus size, never all-pairs — plus the candidate-pair
    * dedup. 16-bit bands give 65 536 buckets per band: at 10⁹ docs
    * that is ~15 k docs/bucket from hash dispersion alone, and a
    * pathological hot band value is AQE's skew-join case. The
    * signature frame is cached because the 4-band union scans it four
    * times. Differs from [[graft.operators.Dedup.dDedupSimhash]]
    * (random-hyperplane SimHash over word hashes) in the hash family:
    * aHash binarizes a FEATURE HISTOGRAM against its own mean — the
    * perceptual-hash construction that survives a codec swap (the
    * histogram becomes pixel patches; nothing downstream moves).
    *
    * Reference surface: near-dup pair generation as in the MinHash /
    * SimHash family (SURVEY §2 dedup rows); no shortcut analog (the
    * reference has no media types — this is 100 TB-brief surface). */
  /** Exact hamming distance over the 4 carried band pairs — the ONE
    * Spark copy, mirroring [[hammingSql]]. */
  private def hammingCol: org.apache.spark.sql.Column =
    (0 until 4).map(i =>
      bit_count(col(s"x$i").bitwiseXOR(col(s"y$i")))).reduce(_ + _)
      .cast("long")

  def mPhash(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup.HammingK
    // verify BEFORE the pair dedup: hamming is per-row arithmetic
    // (identical for every duplicate of a pair, so filter∘distinct ≡
    // distinct∘filter exactly) while the dedup is a shuffle — at
    // measured precision 0.07 the filter shrinks that exchange ~14×.
    // m_phash_eval, which needs the DISTINCT candidate count, pays the
    // full dedup on its own path.
    phashCandRaw(spark, dir)
      .withColumn("hamming", hammingCol)
      .filter(col("hamming") <= HammingK)
      .dropDuplicates("id1", "id2")
      .select("id1", "id2", "hamming")
      .orderBy("id1", "id2")
  }

  /** Distinct band-collision pairs with their exact hamming distance —
    * [[mPhashEval]]'s candidate set. Hamming is computed BEFORE the
    * pair dedup: it is per-row arithmetic over the carried signatures
    * (identical for every duplicate of a pair, so dedup∘compute ≡
    * compute∘dedup exactly), and folding it first lets the distinct
    * shuffle carry 3 narrow columns instead of the 8 signature bands —
    * the suite's largest exchange (94 MB) shrank to ids+hamming. */
  private def phashCand(spark: SparkSession, dir: String): DataFrame =
    phashCandRaw(spark, dir)
      .withColumn("hamming", hammingCol)
      .select("id1", "id2", "hamming")
      .dropDuplicates("id1", "id2")

  /** The signature + banding pipeline shared by [[mPhash]] and
    * [[mPhashEval]]: band-collision pair rows (up to one per matching
    * band — NOT deduplicated; both consumers choose where the
    * distinct goes relative to their filters). */
  private def phashCandRaw(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.{md5_32, words}
    val d = Tables(spark, dir).documents
    // binary payload in (the multimodal contract); the stub "decode"
    // is byte-exact UTF-8 here, a codec everywhere else
    val payloads = d.select(col("doc_id"),
      encode(col("text"), "UTF-8").cast("binary").as("payload"))
    // materialized bin array — a plain attribute, so the 64 histogram
    // folds below reference it without re-running the md5 chain
    // (the shinglesFromWords projection discipline)
    val bins = payloads.select(col("doc_id"),
      transform(words(decode(col("payload"), "UTF-8")),
        w => pmod(md5_32(w), lit(PhashBins.toLong))).as("bins"))
    // one-pass histogram expression: the HOF spelling
    //   transform(sequence(0, 63), i => size(filter(bins, b => b === i)))
    // scanned the bin array 64 TIMES per row through interpreted
    // lambdas (ExprSpec pins HistogramBins ≡ that spelling)
    val hist = bins.select(col("doc_id"),
      size(col("bins")).cast("long").as("tot"),
      graft.functions.expr.FoldExpressions.histogramBins(
        col("bins"), PhashBins).as("h"))
    val sig = hist.filter(col("tot") >= PhashMinFeatures)
      .select(col("doc_id") +: (0 until 4).map { b =>
        (0 until 16).map { i =>
          when(element_at(col("h"), 16 * b + i + 1) * 64 > col("tot"),
            lit(1L << i)).otherwise(lit(0L))
        }.reduce(_ + _).as(s"s$b")
      }: _*)
      // Lazy localCheckpoint, not cache: both sides of the banding
      // self-join reference the signature frame, but a cache() pins
      // it for the session (no caller owns the unpersist once the
      // pair frame is returned) — checkpoint blocks are released by
      // the ContextCleaner when the frame is GC'd.
      .localCheckpoint(false)
    val banded = (0 until 4).map { b =>
      sig.select(col("doc_id"), col("s0"), col("s1"), col("s2"), col("s3"),
        lit(b).as("band"), col(s"s$b").as("bv"))
    }.reduce(_ unionByName _)
    banded.as("a").join(banded.as("b"), Seq("band", "bv"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.s0").as("x0"), col("a.s1").as("x1"),
        col("a.s2").as("x2"), col("a.s3").as("x3"),
        col("b.s0").as("y0"), col("b.s1").as("y1"),
        col("b.s2").as("y2"), col("b.s3").as("y3"))
  }

  /** m_phash_eval — candidate-quality audit of the perceptual-hash
    * banding (the [[graft.operators.Dedup]] d_dedup_eval discipline
    * applied to the multimodal near-dup): band-collision candidates
    * vs hamming-verified pairs as one row (n_cand, n_pairs, fp,
    * precision) — the measured number the 4×16-bit banding choice
    * rides on (wider bands ⇒ fewer, dirtier buckets ⇒ lower
    * precision and more verify work; narrower ⇒ more buckets and
    * recall risk). RECALL is structural here, not measured: 4 bands
    * are pigeonhole-complete for hamming ≤ 3 (PipelineSpec
    * brute-forces the exact ball), so truth ⊆ candidates and fn = 0
    * by theorem — the one number d_dedup_eval must estimate that
    * this audit gets for free. Cost: the same banding pipeline plus
    * two counts — no extra corpus pass. */
  def mPhashEval(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup.HammingK
    val cand = phashCand(spark, dir)
    // coalesce: sum over ZERO candidate rows is NULL in both engines —
    // an empty banding must read 0 pairs / 0 fp / vacuous precision 1,
    // not NULLs the hash gate can't distinguish from the oracle's own
    cand.agg(
        count(lit(1)).as("n_cand"),
        coalesce(sum(when(col("hamming") <= HammingK, 1L).otherwise(0L)),
          lit(0L)).as("n_pairs"))
      .select(col("n_cand"), col("n_pairs"),
        (col("n_cand") - col("n_pairs")).as("fp"),
        when(col("n_cand") === 0L, lit(1.0))
          .otherwise(graft.functions.Parity.stableRound(
            col("n_pairs").cast("double") / col("n_cand").cast("double"), 6))
          .as("precision"))
  }

  /** CTE chain ending in `cand(id1, id2, x0..x3, y0..y3)` — the ONE
    * SQL copy of the signature + banding pipeline, shared by the
    * m_phash and m_phash_eval oracles. */
  private val mPhashCoreSql: String = {
    import graft.functions.TextFunctions.normSql
    val bandSums = (0 until 4).map { b =>
      s"sum(CASE WHEN bin // 16 = $b THEN bit << (bin % 16) ELSE 0 END)::BIGINT AS s$b"
    }.mkString(",\n|          ")
    s"""WITH toks AS (
       |  SELECT doc_id, ('0x' || substr(md5(w), 1, 8))::BIGINT % $PhashBins AS bin
       |  FROM (SELECT doc_id, unnest(string_split($normSql, ' ')) AS w
       |        FROM documents) e),
       |hist AS (SELECT doc_id, bin, count(*)::BIGINT AS h
       |         FROM toks GROUP BY doc_id, bin),
       |tot AS (SELECT doc_id, sum(h)::BIGINT AS tot FROM hist GROUP BY doc_id
       |        HAVING sum(h) >= ${PhashMinFeatures}),
       |bits AS (
       |  SELECT h.doc_id, h.bin,
       |    CASE WHEN h.h * 64 > t.tot THEN 1::BIGINT ELSE 0::BIGINT END AS bit
       |  FROM hist h JOIN tot t USING (doc_id)),
       |sig AS (SELECT doc_id,
       |          $bandSums
       |        FROM bits GROUP BY doc_id),
       |bands AS (SELECT doc_id, s0, s1, s2, s3, b,
       |            CASE b WHEN 0 THEN s0 WHEN 1 THEN s1 WHEN 2 THEN s2 ELSE s3 END AS bv
       |          FROM sig CROSS JOIN (SELECT unnest(range(4)) AS b) bb),
       |cand AS (
       |  SELECT DISTINCT a.doc_id id1, b.doc_id id2,
       |    a.s0 x0, a.s1 x1, a.s2 x2, a.s3 x3,
       |    b.s0 y0, b.s1 y1, b.s2 y2, b.s3 y3
       |  FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv
       |    AND a.doc_id < b.doc_id)""".stripMargin
  }

  private val hammingSql: String =
    "bit_count(xor(x0, y0)) + bit_count(xor(x1, y1)) + " +
      "bit_count(xor(x2, y2)) + bit_count(xor(x3, y3))"

  val mPhashSql: String =
    s"""$mPhashCoreSql
       |SELECT id1, id2, ($hammingSql)::BIGINT AS hamming
       |FROM cand
       |WHERE $hammingSql <= ${graft.operators.Dedup.HammingK}
       |ORDER BY id1, id2""".stripMargin

  val mPhashEvalSql: String =
    s"""$mPhashCoreSql
       |SELECT n_cand, n_pairs, n_cand - n_pairs AS fp,
       |  CASE WHEN n_cand = 0 THEN 1.0
       |       ELSE ${graft.functions.Parity.stableRoundSql(
                  "n_pairs::DOUBLE / n_cand::DOUBLE", 6)} END AS precision
       |FROM (SELECT count(*)::BIGINT AS n_cand,
       |        COALESCE(sum(CASE WHEN $hammingSql <= ${graft.operators.Dedup.HammingK}
       |            THEN 1 ELSE 0 END), 0)::BIGINT AS n_pairs
       |      FROM cand) t""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_binary_meta" -> mBinaryMeta,
    "m_frame_sample" -> mFrameSample,
    "m_resize" -> mResize,
    "m_shard_pack" -> mShardPack,
    "m_caption_pair" -> mCaptionPair,
    "m_video_scene" -> mVideoScene,
    "m_phash" -> mPhash,
    "m_phash_eval" -> mPhashEval,
  )

  def oracles: Map[String, String] = Map(
    "m_binary_meta" -> mBinaryMetaSql,
    "m_frame_sample" -> mFrameSampleSql,
    "m_resize" -> mResizeSql,
    "m_shard_pack" -> mShardPackSql,
    "m_caption_pair" -> mCaptionPairSql,
    "m_video_scene" -> mVideoSceneSql,
    "m_phash" -> mPhashSql,
    "m_phash_eval" -> mPhashEvalSql,
  )
}
