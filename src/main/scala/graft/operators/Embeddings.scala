package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Parity.{stableRound, stableRoundSql}
import graft.operators.Similarity.dot

/** Embedding-column transforms over the `embeddings` table — the
  * vector preprocessing a training pipeline runs before ANN indexing
  * or storage: L2 normalization (so downstream similarity is one dot
  * product, see [[Similarity.withUnit]]) and symmetric int8
  * quantization (4× smaller vectors for the ANN candidate tier).
  *
  * Both are single-pass NARROW maps — no shuffle at any corpus size;
  * the only exchange in either plan is the presentation orderBy. At
  * 100 TB each 128 MB parquet split quantizes independently, and the
  * scan reads only (vec_id, embedding) — column pruning reaches the
  * parquet reader.
  *
  * Cross-engine float parity: every output double is built with the
  * same IEEE op sequence the DuckDB oracle uses — norm² folds the
  * squared components in ARRAY ORDER from 0.0 (the
  * [[graft.functions.expr.VectorExpressions]] DotProduct loop ≡
  * DuckDB `list_reduce(list_prepend(0.0, …))`), and sqrt/divide are
  * correctly-rounded IEEE ops — so values are bit-identical and no
  * rounding step is needed at all (rounding is the one step whose
  * engine implementations can disagree; omitting it removes the
  * risk). Max-abs is exact (comparisons, no accumulation error).
  */
object Embeddings {

  /** Quantization grid half-width: int8 symmetric, q ∈ [-127, 127]. */
  val QuantLevels = 127.0

  /** e_normalize — unit-L2 vectors plus the norm itself.
    *
    * Output shape is EXPLODED scalar rows (vec_id, dim, unit_val,
    * l2_norm) — the driver's checker sorts results with pandas, which
    * cannot order an ARRAY column, so array outputs follow the same
    * contract [[eCentroid]] set: one row per element. A library caller
    * wanting the packed vector groups back with
    * `collect_list(struct(dim, unit_val))` — the explode is narrow and
    * adds no shuffle.
    *
    * A zero vector normalizes to NaNs in BOTH engines (0.0/0.0 under
    * identical IEEE rules) — no special-casing needed for parity. */
  def eNormalize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
    e.withColumn("l2_norm", sqrt(dot(col("embedding"), col("embedding"))))
      .select(col("vec_id"), col("l2_norm"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos").cast("long").as("dim"),
        (col("col").cast("double") / col("l2_norm")).as("unit_val"),
        col("l2_norm"))
      .orderBy("vec_id", "dim")
  }

  val eNormalizeSql: String =
    """WITH n AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_reduce(
      |      list_prepend(0.0, list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)),
      |      (a, b) -> a + b)) AS l2_norm
      |  FROM embeddings),
      |u AS (
      |  SELECT vec_id, l2_norm, unnest(embedding) AS x,
      |    generate_subscripts(embedding, 1) AS i
      |  FROM n)
      |SELECT vec_id, (i - 1)::BIGINT AS dim, x::DOUBLE / l2_norm AS unit_val, l2_norm
      |FROM u ORDER BY vec_id, dim""".stripMargin

  /** e_quantize — symmetric int8 quantization: q = ⌊x/absmax·127 + ½⌋
    * (half-up toward +∞, identical `floor` formulation in both
    * engines), scale stored per vector for dequantization. absmax is
    * a comparison fold — EXACT, so the scale carries no accumulation
    * error and the whole output is integer-or-exact. An all-zero
    * vector keeps absmax = 0 and quantizes to zeros (guarded CASE —
    * NaN would cast differently per engine, so this one case is
    * pinned explicitly). */
  def eQuantize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
    val amax = graft.functions.expr.FoldExpressions.absMaxArray(col("embedding"))
    // Exploded scalar rows (vec_id, dim, q8, abs_max) — same
    // driver-checkable shape as eNormalize/eCentroid.
    e.withColumn("abs_max", amax)
      .select(col("vec_id"), col("abs_max"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos").cast("long").as("dim"),
        when(col("abs_max") === 0.0, lit(0))
          .otherwise(floor(col("col").cast("double") / col("abs_max") * lit(QuantLevels)
            + lit(0.5)).cast("int")).as("q8"),
        col("abs_max"))
      .orderBy("vec_id", "dim")
  }

  val eQuantizeSql: String =
    s"""WITH m AS (
       |  SELECT vec_id, embedding,
       |    list_reduce(
       |      list_prepend(0.0, list_transform(embedding, x -> abs(x::DOUBLE))),
       |      (a, b) -> greatest(a, b)) AS abs_max
       |  FROM embeddings),
       |u AS (
       |  SELECT vec_id, abs_max, unnest(embedding) AS x,
       |    generate_subscripts(embedding, 1) AS i
       |  FROM m)
       |SELECT vec_id, (i - 1)::BIGINT AS dim,
       |  CASE WHEN abs_max = 0.0 THEN 0
       |       ELSE CAST(floor(x::DOUBLE / abs_max * $QuantLevels + 0.5) AS INTEGER)
       |  END AS q8,
       |  abs_max
       |FROM u ORDER BY vec_id, dim""".stripMargin

  /** Sub-group fan-out of the centroid fold: each (label, dim) cell's
    * values split into this many deterministic sub-groups
    * (vec_id mod Subs), summed independently, then combined in sub
    * order. */
  val CentroidSubs = 64

  /** e_centroid — per-label mean embedding (classifier prototypes,
    * clustering seeds, IVF training), EXACT cross-engine.
    *
    * A float mean needs a pinned summation order for oracle parity,
    * but a flat sorted fold would gather each (label, dim) cell into
    * one row — corpus/labels values, the whole-shard-row failure mode
    * d_shard §10b eliminated. Same cure, applied to sums: the fold is
    * HIERARCHICAL over data-defined sub-groups (vec_id mod
    * [[CentroidSubs]] — engine-mirrorable, planner-independent).
    * Values hash-shuffle once on (label, dim, sub) and each sub-group
    * folds STREAMING inside mapPartitions over the sorted partition —
    * no row ever holds a cell's value list; only the bounded
    * labels×dims×Subs partial rows materialize, and the final
    * combine folds ≤ Subs partials per cell in sub order. DuckDB
    * mirrors the exact two-level structure (per-sub sorted
    * list_reduce, then sub-ordered list_reduce), so every double is
    * bit-identical — value-order ties are harmless because equal
    * addends produce the same partial-sum sequence regardless of
    * their relative order.
    *
    * At 100 TB: explode is narrow, the one wide exchange is linear in
    * values, partial state is O(labels·dims·Subs) ≪ corpus. Cell
    * growth lands in the per-partition stream, never in a row. */
  /** The hierarchical pinned fold's streaming stage, shared by
    * [[eCentroid]] and [[eGram]]: values arrive as (k1, k2, sub, v),
    * hash-shuffle once on the full key, sort within partitions, and
    * each contiguous (k1, k2, sub) group folds to (n, partial-sum)
    * without ever materializing a value list in a row. */
  private def streamSubFold(spark: SparkSession, values: DataFrame,
      k1: String, k2: String): DataFrame =
    streamSubFold2(spark,
      values.select(col(k1), col(k2), col("sub"),
        lit(0L).as("w"), col("v")), k1, k2)
      .drop("wsum")

  /** The general form, shared with [[Classify]]'s calibration fold:
    * values arrive as (k1, k2, sub, w, v) with an extra LONG weight
    * summed order-free alongside the pinned double fold — output
    * (k1, k2, sub, n, wsum, s). The sort key stays (k1, k2, sub, v):
    * w is integer, so its sum needs no order pin, and v-ties reorder
    * only equal addends. */
  private[operators] def streamSubFold2(spark: SparkSession, values: DataFrame,
      k1: String, k2: String): DataFrame = {
    import spark.implicits._
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    values
      .repartition(parts, col(k1), col(k2), col("sub"))
      .sortWithinPartitions(col(k1), col(k2), col("sub"), col("v"))
      .as[(Int, Int, Int, Long, Double)]
      .mapPartitions { rows =>
        // groups are contiguous after the sort; stream one fold each
        val out = Seq.newBuilder[(Int, Int, Int, Long, Long, Double)]
        var cur: (Int, Int, Int) = null
        var n = 0L
        var w = 0L
        var s = 0.0
        def flush(): Unit =
          if (cur != null) out += ((cur._1, cur._2, cur._3, n, w, s))
        rows.foreach { case (a, b, sub, wi, v) =>
          val k = (a, b, sub)
          if (k != cur) { flush(); cur = k; n = 0L; w = 0L; s = 0.0 }
          n += 1L
          w += wi
          s += v
        }
        flush()
        out.result().iterator
      }
      .toDF(k1, k2, "sub", "n", "wsum", "s")
  }

  def eCentroid(spark: SparkSession, dir: String): DataFrame =
    centroidFrame(spark, dir).orderBy("label", "dim")

  /** The [[eCentroid]] pipeline without the presentation sort —
    * unordered (label, dim, centroid, n_vectors), shared with
    * [[eSilhouette]]'s per-label prototypes. Centroids are EXACT
    * (no rounding): downstream consumers fold further floats off
    * them and round once at their own output. */
  private[operators] def centroidFrame(spark: SparkSession, dir: String): DataFrame =
    centroidOf(spark, Tables(spark, dir).embeddings)

  private[graft] def centroidOf(spark: SparkSession, e: DataFrame): DataFrame = {
    val exploded = e.select(col("label"),
        pmod(col("vec_id"), lit(CentroidSubs.toLong)).cast("int").as("sub"),
        posexplode(col("embedding")))
      .select(col("label"), col("pos").as("dim"), col("sub"),
        col("col").cast("double").as("v"))
    val subsums = streamSubFold(spark, exploded, "label", "dim")
    subsums.groupBy("label", "dim")
      .agg(sum("n").cast("long").as("n_vectors"),
        sort_array(collect_list(struct(col("sub"), col("s")))).as("ss"))
      .select(col("label"), col("dim").cast("long").as("dim"),
        (graft.functions.expr.FoldExpressions.sumArrayField(col("ss"), "s")
          / col("n_vectors")).as("centroid"),
        col("n_vectors"))
  }

  /** CTE chain ending in `cells$p(label, dim, n_vectors, total)` —
    * the ONE SQL copy of the hierarchical centroid fold (the normSql
    * single-copy discipline), parametrized with a CTE-name suffix and
    * a row filter so [[eDriftSql]] can instantiate it once per
    * snapshot half. */
  private def centroidCellsSqlFor(p: String, where: String): String =
    s"""v$p AS (
       |  SELECT label, vec_id % $CentroidSubs AS sub, i - 1 AS dim, x::DOUBLE AS v
       |  FROM (SELECT label, vec_id, unnest(embedding) AS x,
       |        generate_subscripts(embedding, 1) AS i FROM embeddings
       |        WHERE $where) u),
       |subs$p AS (
       |  SELECT label, dim, sub, count(*) AS n,
       |    list_reduce(list_prepend(0.0, list(v ORDER BY v)), (a, b) -> a + b) AS s
       |  FROM v$p GROUP BY 1, 2, 3),
       |cells$p AS (
       |  SELECT label, dim, sum(n)::BIGINT AS n_vectors,
       |    list_reduce(list_prepend(0.0, list(s ORDER BY sub)), (a, b) -> a + b) AS total
       |  FROM subs$p GROUP BY 1, 2)""".stripMargin

  /** The unfiltered instantiation, shared by the e_centroid and
    * e_silhouette oracles. */
  val centroidCellsSql: String = centroidCellsSqlFor("", "true")

  val eCentroidSql: String =
    s"""WITH $centroidCellsSql
       |SELECT label, dim, total / n_vectors AS centroid, n_vectors
       |FROM cells ORDER BY label, dim""".stripMargin

  // ----------------------------------------------------- e_silhouette

  /** e_silhouette — per-label SIMPLIFIED SILHOUETTE over the embedding
    * space: for every vector, a = distance to its own label's exact
    * centroid, b = distance to the nearest OTHER label's centroid,
    * s = (b − a) / max(a, b); reported as the per-label mean — the
    * cluster-coherence gate a pipeline reads before trusting label
    * columns for SemDeDup scoping, per-label sampling, or IVF
    * training (low silhouette ⟹ the labels don't separate in
    * embedding space and label-scoped dedup will leak duplicates
    * across labels).
    *
    * "Simplified" (Hruschka et al.) replaces full silhouette's
    * all-pairs O(N²) neighbor means with distances to the K label
    * centroids — the only formulation that scales: centroids come
    * from the [[centroidFrame]] hierarchical exact fold, attach as a
    * ONE-ROW broadcast (K·D doubles), and every per-vector distance
    * folds NARROWLY over the centroid array — no N×K shuffle, no
    * all-pairs anything; the one keyed exchange is the per-label mean.
    *
    * Parity: distances fold ascending-dim from 0.0 (zip_with array
    * order ≡ the oracle's ORDER BY dim), float→double casts sit at
    * the same op (x::DOUBLE − c), sqrt/÷ are correctly-rounded IEEE,
    * min over identical doubles is order-free, the per-label mean
    * rides the [[streamSubFold]] hierarchical pinned fold (never a
    * per-label value list in one row), and the single round is
    * stableRound(6) at the output.
    *
    * On the synthetic corpus the gate records the NEGATIVE diagnostic:
    * the `label` column is not an embedding-space clustering
    * (silhouette ≈ 0, slightly negative — the honest "don't scope
    * dedup by this column" answer); the spec demonstrates the
    * separated-cluster positive case on a synthetic frame. */
  def eSilhouette(spark: SparkSession, dir: String): DataFrame =
    silhouetteOf(spark, Tables(spark, dir).embeddings)

  private[graft] def silhouetteOf(spark: SparkSession, e: DataFrame): DataFrame = {
    val cents = centroidOf(spark, e)
      .groupBy(col("label").as("clabel"))
      .agg(array_sort(collect_list(struct(col("dim"), col("centroid")))).as("cs"))
      .select(col("clabel"), transform(col("cs"),
        x => x.getField("centroid")).as("cvec"))
      // one row: the K (clabel, cvec) prototypes — the tLogprob
      // scalar-broadcast pattern, not an all-pairs hazard
      .agg(array_sort(collect_list(struct(col("clabel"), col("cvec")))).as("cents"))
    val withD = e.select(col("vec_id"), col("label"), col("embedding"))
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"),
        transform(col("cents"), c => struct(
          c.getField("clabel").as("cl"),
          sqrt(graft.functions.expr.FoldExpressions.squaredL2(
            col("embedding"), c.getField("cvec")))
            .as("d"))).as("dists"))
    val sv = withD
      .select(col("vec_id"), col("label"),
        array_min(transform(filter(col("dists"),
          x => x.getField("cl") === col("label")), x => x.getField("d"))).as("a"),
        array_min(transform(filter(col("dists"),
          x => x.getField("cl") =!= col("label")), x => x.getField("d"))).as("b"))
      .select(col("label"), lit(0).as("zero"),
        pmod(col("vec_id"), lit(CentroidSubs.toLong)).cast("int").as("sub"),
        // b is NULL when the frame has a single distinct label (no
        // "other" centroid exists) — silhouette is undefined there;
        // report the no-structure answer 0 instead of letting the
        // null crash the non-nullable fold downstream
        when(col("b").isNull, lit(0.0))
          .when(greatest(col("a"), col("b")) > 0,
            (col("b") - col("a")) / greatest(col("a"), col("b")))
          .otherwise(lit(0.0)).as("v"))
    streamSubFold(spark, sv, "label", "zero")
      .groupBy("label")
      .agg(sum("n").cast("long").as("n_vectors"),
        sort_array(collect_list(struct(col("sub"), col("s")))).as("ss"))
      .select(col("label"), col("n_vectors"),
        stableRound(graft.functions.expr.FoldExpressions
          .sumArrayField(col("ss"), "s") / col("n_vectors"), 6)
          .as("silhouette"))
      .orderBy("label")
  }

  val eSilhouetteSql: String =
    s"""WITH $centroidCellsSql,
       |cents AS (SELECT label AS clabel, dim, total / n_vectors AS c FROM cells),
       |ev AS (
       |  SELECT vec_id, label, i - 1 AS dim, x::DOUBLE AS x
       |  FROM (SELECT vec_id, label, unnest(embedding) AS x,
       |        generate_subscripts(embedding, 1) AS i FROM embeddings) u),
       |grid AS (
       |  SELECT ev.vec_id, ev.label, c.clabel,
       |    sqrt(list_reduce(list_prepend(0.0,
       |      list((ev.x - c.c) * (ev.x - c.c) ORDER BY ev.dim)),
       |      (a, b) -> a + b)) AS d
       |  FROM ev JOIN cents c ON c.dim = ev.dim
       |  GROUP BY ev.vec_id, ev.label, c.clabel),
       |ab AS (
       |  SELECT vec_id, label,
       |    min(CASE WHEN clabel = label THEN d END) AS a,
       |    min(CASE WHEN clabel <> label THEN d END) AS b
       |  FROM grid GROUP BY 1, 2),
       |sv AS (
       |  SELECT label, vec_id % $CentroidSubs AS sub,
       |    CASE WHEN b IS NULL THEN 0.0
       |         WHEN greatest(a, b) > 0 THEN (b - a) / greatest(a, b)
       |         ELSE 0.0 END AS s
       |  FROM ab),
       |ssub AS (
       |  SELECT label, sub, count(*) AS n,
       |    list_reduce(list_prepend(0.0, list(s ORDER BY s)), (a, b) -> a + b) AS t
       |  FROM sv GROUP BY 1, 2),
       |agg AS (
       |  SELECT label, sum(n)::BIGINT AS n_vectors,
       |    list_reduce(list_prepend(0.0, list(t ORDER BY sub)), (a, b) -> a + b) AS tot
       |  FROM ssub GROUP BY 1)
       |SELECT label, n_vectors,
       |  ${stableRoundSql("tot / n_vectors", 6)} AS silhouette
       |FROM agg ORDER BY label""".stripMargin

  // --------------------------------------------------------- e_drift

  /** e_drift — per-label embedding-space drift between two ingest
    * snapshots: the exact centroid of each label in each snapshot
    * (the [[centroidOf]] hierarchical fold, once per half), then the
    * L2 shift and cosine similarity between the two prototypes. The
    * embedding-side twin of [[TextAnalysis.tDrift]]'s token-JSD
    * monitor: when a label's centroid moves (encoder refresh, source
    * composition change, ingest bug), SemDeDup scoping, IVF routing,
    * and classifier prototypes trained on the old geometry silently
    * degrade — this is the gate that catches it BEFORE retraining.
    * Snapshots are the vec_id parity halves (the data shim — a real
    * pipeline passes two snapshot tables; everything from the join
    * down is unchanged).
    *
    * Scale shape: two centroid pipelines (each: one keyed exchange,
    * bounded partials — see [[eCentroid]]), an equi-join on (label,
    * dim) over K·D rows (≪ corpus), and a D-bounded sorted fold per
    * label. Nothing after the centroid exchanges scales with corpus
    * size.
    *
    * Float parity: centroids are exact ([[centroidOf]]); the four
    * drift sums fold dim-ascending from 0.0 over the D-bounded list
    * with per-element products, sqrt/÷ correctly-rounded IEEE,
    * rounded once at the output. Zero-norm prototypes (impossible on
    * unit-norm inputs, routine on all-zero padding vectors) route the
    * cosine through an explicit CASE to 0.0 in both engines. */
  def eDrift(spark: SparkSession, dir: String): DataFrame =
    eDriftOf(spark, Tables(spark, dir).embeddings)

  /** The drift computation over any embeddings frame — factored so
    * the spec can drive the one-sided-label case the gate fixture
    * never produces. The snapshot join is FULL OUTER with the missing
    * side's prototype coalesced to the zero vector: a label present
    * in only one snapshot — the most drastic composition change the
    * monitor exists to catch — reports loudly (n = 0 on the missing
    * side, l2_drift = the present prototype's norm, cos_sim = 0 via
    * the zero-norm guard) instead of silently vanishing from the
    * report. */
  private[graft] def eDriftOf(spark: SparkSession, e: DataFrame): DataFrame = {
    val a = centroidOf(spark, e.filter(pmod(col("vec_id"), lit(2L)) === 0))
      .select(col("label"), col("dim"), col("centroid").as("ca"),
        col("n_vectors").as("na"))
    val b = centroidOf(spark, e.filter(pmod(col("vec_id"), lit(2L)) === 1))
      .select(col("label"), col("dim"), col("centroid").as("cb"),
        col("n_vectors").as("nb"))
    def fold(f: Column => Column): Column =
      aggregate(col("ds"), lit(0.0), (acc, x) => acc + f(x))
    a.join(b, Seq("label", "dim"), "full_outer")
      .select(col("label"), col("dim"),
        coalesce(col("ca"), lit(0.0)).as("ca"),
        coalesce(col("cb"), lit(0.0)).as("cb"),
        col("na"), col("nb"))
      .groupBy("label")
      .agg(coalesce(max(col("na")), lit(0L)).as("n_a"),
        coalesce(max(col("nb")), lit(0L)).as("n_b"),
        sort_array(collect_list(struct(col("dim"), col("ca"), col("cb"))))
          .as("ds"))
      .select(col("label"), col("n_a"), col("n_b"),
        fold(x => (x.getField("ca") - x.getField("cb")) *
          (x.getField("ca") - x.getField("cb"))).as("dd"),
        fold(x => x.getField("ca") * x.getField("cb")).as("dot"),
        fold(x => x.getField("ca") * x.getField("ca")).as("sa2"),
        fold(x => x.getField("cb") * x.getField("cb")).as("sb2"))
      .select(col("label"), col("n_a"), col("n_b"),
        stableRound(sqrt(col("dd")), 6).as("l2_drift"),
        when(col("sa2") > 0 && col("sb2") > 0,
          stableRound(col("dot") / (sqrt(col("sa2")) * sqrt(col("sb2"))), 6))
          .otherwise(lit(0.0)).as("cos_sim"))
      .orderBy("label")
  }

  val eDriftSql: String =
    s"""WITH ${centroidCellsSqlFor("a", "vec_id % 2 = 0")},
       |${centroidCellsSqlFor("b", "vec_id % 2 = 1")},
       |pa AS (SELECT label, dim, total / n_vectors AS c, n_vectors FROM cellsa),
       |pb AS (SELECT label, dim, total / n_vectors AS c, n_vectors FROM cellsb),
       |j AS (
       |  SELECT COALESCE(pa.label, pb.label) AS label,
       |    COALESCE(pa.dim, pb.dim) AS dim,
       |    COALESCE(pa.c, 0.0) AS x, COALESCE(pb.c, 0.0) AS y,
       |    pa.n_vectors AS na, pb.n_vectors AS nb
       |  FROM pa FULL JOIN pb ON pa.label = pb.label AND pa.dim = pb.dim),
       |f AS (
       |  SELECT label, COALESCE(max(na), 0)::BIGINT AS n_a,
       |    COALESCE(max(nb), 0)::BIGINT AS n_b,
       |    list_reduce(list_prepend(0.0, list((x - y) * (x - y) ORDER BY dim)),
       |      (a, b) -> a + b) AS dd,
       |    list_reduce(list_prepend(0.0, list(x * y ORDER BY dim)),
       |      (a, b) -> a + b) AS dot,
       |    list_reduce(list_prepend(0.0, list(x * x ORDER BY dim)),
       |      (a, b) -> a + b) AS sa2,
       |    list_reduce(list_prepend(0.0, list(y * y ORDER BY dim)),
       |      (a, b) -> a + b) AS sb2
       |  FROM j GROUP BY label)
       |SELECT label, n_a, n_b,
       |  ${stableRoundSql("sqrt(dd)", 6)} AS l2_drift,
       |  CASE WHEN sa2 > 0 AND sb2 > 0
       |       THEN ${stableRoundSql("dot / (sqrt(sa2) * sqrt(sb2))", 6)}
       |       ELSE 0.0 END AS cos_sim
       |FROM f ORDER BY label""".stripMargin

  // ---------------------------------------------------------- e_gram

  /** Keep 1-in-4 vectors (salted md5) for the Gram sample — the
    * train-on-sample discipline: PCA / whitening / OPQ rotations fit
    * on a bounded sample, exactly like the PQ codebooks. */
  val GramSampleMod = 4

  /** e_gram — the exact Gram matrix Σ x·xᵀ over a deterministic
    * md5-sampled subset, as (dim_i ≤ dim_j) scalar rows: the second
    * moment every embedding-space rotation (PCA whitening, OPQ's
    * R, low-rank compression) trains on. Mean-center downstream with
    * [[eCentroid]]'s vectors if covariance proper is wanted — the
    * uncentered moment is the storable, mergeable artifact.
    *
    * Cross-engine EXACT, not rounded: each product xᵢ·xⱼ is one
    * correctly-rounded double op on float-exact inputs, and the sums
    * run the [[eCentroid]] hierarchical pinned fold (per-sub streaming
    * sorted fold, then sub-ordered combine) — bit-identical in DuckDB.
    *
    * Scale: the pair explode is d(d+1)/2 per sampled vector — linear
    * in the sample with a d²/2 constant, then ONE hash exchange whose
    * state is O(d²·Subs). The sample mod bounds total work the way
    * the PQ/IVF trainers bound theirs; a full-corpus pass would swap
    * the explode for per-partition outer-product accumulation
    * (mapPartitions d×d locals) at the cost of the engine-mirrorable
    * sum order — sampled-and-exact is the curation-pipeline tradeoff
    * this operator pins. */
  def eGram(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
      .filter(graft.functions.TextFunctions.md5_32(
        concat(lit("grm:"), col("vec_id").cast("string"))) % GramSampleMod === 0)
      .select(pmod(col("vec_id"), lit(CentroidSubs.toLong)).cast("int").as("sub"),
        col("embedding"))
    val xi = e.select(col("sub"), col("embedding"), posexplode(col("embedding")))
      .select(col("sub"), col("embedding"), col("pos").as("di"),
        col("col").cast("double").as("xi"))
    val pairs = xi.select(col("sub"), col("di"), col("xi"),
        posexplode(col("embedding")))
      .filter(col("di") <= col("pos"))
      .select(col("di"), col("pos").as("dj"), col("sub"),
        (col("xi") * col("col").cast("double")).as("v"))
    streamSubFold(spark, pairs, "di", "dj")
      .groupBy("di", "dj")
      .agg(sum("n").cast("long").as("n_vectors"),
        sort_array(collect_list(struct(col("sub"), col("s")))).as("ss"))
      .select(col("di").cast("long").as("dim_i"), col("dj").cast("long").as("dim_j"),
        graft.functions.expr.FoldExpressions.sumArrayField(col("ss"), "s")
          .as("gram"),
        col("n_vectors"))
      .orderBy("dim_i", "dim_j")
  }

  val eGramSql: String =
    s"""WITH smp AS (
       |  SELECT vec_id % $CentroidSubs AS sub, embedding
       |  FROM embeddings
       |  WHERE ('0x' || substr(md5('grm:' || vec_id::VARCHAR), 1, 8))::BIGINT % $GramSampleMod = 0),
       |x1 AS (
       |  SELECT sub, embedding, generate_subscripts(embedding, 1) AS i,
       |    unnest(embedding)::DOUBLE AS xi
       |  FROM smp),
       |v AS (
       |  SELECT i - 1 AS di, j - 1 AS dj, sub, xi * xj AS v FROM (
       |    SELECT sub, i, xi, generate_subscripts(embedding, 1) AS j,
       |      unnest(embedding)::DOUBLE AS xj
       |    FROM x1) t
       |  WHERE i <= j),
       |subs AS (
       |  SELECT di, dj, sub, count(*) AS n,
       |    list_reduce(list_prepend(0.0, list(v ORDER BY v)), (a, b) -> a + b) AS s
       |  FROM v GROUP BY 1, 2, 3),
       |cells AS (
       |  SELECT di, dj, sum(n)::BIGINT AS n_vectors,
       |    list_reduce(list_prepend(0.0, list(s ORDER BY sub)), (a, b) -> a + b) AS gram
       |  FROM subs GROUP BY 1, 2)
       |SELECT di AS dim_i, dj AS dim_j, gram, n_vectors
       |FROM cells ORDER BY dim_i, dim_j""".stripMargin

  // ------------------------------------------------------ e_rproject

  /** Johnson–Lindenstrauss target dimension. */
  val RProjDims = 16

  /** The ±1 Rademacher sign for (component r, input dim d): first hex
    * char of md5("rp:r:d") in 0-7 → +1, else −1. MD5 is the same
    * function everywhere, so the Scala-side literal matrix and the
    * oracle's SQL recomputation agree exactly. */
  def rpSign(r: Int, d: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rp:$r:$d".getBytes("UTF-8"))
    if (((hex(0) >> 4) & 0xf) <= 7) 1.0 else -1.0
  }

  /** e_rproject — sparse-free JL random projection to [[RProjDims]]
    * components: coord_r = (Σ_d x_d · s(r,d)) / sqrt(R) with a
    * deterministic Rademacher sign matrix. The distance-preserving
    * cheap dimensionality cut a pipeline runs before LSH/ANN tiers
    * when no trained rotation is available (the trained counterpart
    * is [[eGram]] → [[ePca]]).
    *
    * Scale shape: the sign matrix is a LITERAL in the plan (R·d
    * doubles — zero bytes shuffled, nothing broadcast at runtime),
    * each vector maps narrowly to its R coordinates via per-component
    * zip_with folds, and the explode to scalar rows is narrow too —
    * the only exchange is the presentation sort. Cross-engine EXACT:
    * x·(±1) is sign-flip (precision-free), the fold runs ascending-d
    * from 0.0 in both engines, /sqrt(R) is one correctly-rounded op.
    */
  def eRproject(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
    val d = e.select(size(col("embedding"))).head().getInt(0)
    val comps = (0 until RProjDims).map { r =>
      val signs = array((0 until d).map(i => lit(rpSign(r, i))): _*)
      struct(lit(r.toLong).as("comp"),
        (graft.functions.expr.VectorExpressions.dotProduct(col("embedding"),
          signs) / sqrt(lit(RProjDims.toDouble))).as("coord"))
    }
    e.select(col("vec_id"), explode(array(comps: _*)).as("c"))
      .select(col("vec_id"), col("c.comp").as("comp"), col("c.coord").as("coord"))
      .orderBy("vec_id", "comp")
  }

  val eRprojectSql: String =
    s"""WITH sgn AS (
       |  SELECT r, list_transform(range(0, (SELECT len(embedding) FROM embeddings LIMIT 1)),
       |    d -> CASE WHEN substr(md5('rp:' || r::VARCHAR || ':' || d::VARCHAR), 1, 1)
       |              IN ('0','1','2','3','4','5','6','7') THEN 1.0 ELSE -1.0 END) AS s
       |  FROM (SELECT unnest(range(0, $RProjDims)) AS r))
       |SELECT vec_id, r AS comp,
       |  list_reduce(list_prepend(0.0,
       |    list_transform(range(1, len(embedding) + 1),
       |      i -> embedding[i]::DOUBLE * s[i])),
       |    (a, b) -> a + b) / sqrt($RProjDims.0) AS coord
       |FROM embeddings CROSS JOIN sgn
       |ORDER BY vec_id, comp""".stripMargin

  // ----------------------------------------------------------- e_pca

  /** Principal components kept. */
  val PcaComps = 8

  /** Jacobi sweep convergence threshold on the largest off-diagonal
    * |a_ij| relative to the matrix's max |diagonal|. */
  val PcaTol = 1e-12

  /** Cyclic Jacobi eigendecomposition of a symmetric d×d matrix —
    * deterministic (fixed sweep order, pure float ops, no RNG), so
    * e_pca is reproducible bit-for-bit across runs. Returns
    * (eigenvalues, eigenvectors as columns), unsorted. Driver-side by
    * design: d×d for embedding dims is a few thousand doubles — the
    * bounded-collect class (IVF centroids, PQ codebooks), NOT a
    * corpus-sized pull. */
  def jacobiEig(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val scale = math.max(a0.indices.map(i => math.abs(a0(i)(i))).max, 1e-300)
    var sweep = 0
    var off = Double.MaxValue
    while (off > PcaTol * scale && sweep < 64) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > off) off = math.abs(apq)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** e_pca — top-[[PcaComps]] principal directions of the exact
    * sampled second moment [[eGram]] computes: the trained rotation
    * (PCA whitening / OPQ-style R / low-rank compression) that Gram
    * matrix exists to produce. Output: (comp, dim, loading, eigval,
    * var_ratio) scalar rows, eigenvalues descending, sign pinned
    * (each eigenvector's largest-|loading| dim — first on ties —
    * made positive).
    *
    * Distribution: the heavy work IS [[eGram]] (one corpus-sample
    * pass, one keyed exchange); the eigensolve runs on the driver
    * over d² doubles — bounded state, the train-on-sample discipline.
    * Rows-only at the gate BY DESIGN: no SQL engine exposes an
    * eigensolver, so cross-checking moves to PipelineSpec, which pins
    * orthonormality, the eigen residual ‖Gv − λv‖, the descending
    * order, the sign convention, and run-to-run determinism (the
    * [[Similarity]] ANN recall-bound precedent for non-SQL oracles).
    */
  /** Driver-side PCA over collected (dim_i, dim_j, gram) rows —
    * shared by [[ePca]] and [[eWhiten]] so the Gram pass (the only
    * distributed work) runs once per caller. Returns
    * (comp, dim, loading, eigval, var_ratio) tuples. */
  private def pcaFromGram(gram: Array[org.apache.spark.sql.Row])
      : Seq[(Long, Long, Double, Double, Double)] = {
    val d = gram.map(_.getLong(0)).max.toInt + 1
    val m = Array.ofDim[Double](d, d)
    gram.foreach { r =>
      val (i, j, g) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2))
      m(i)(j) = g
      m(j)(i) = g
    }
    val (vals, vecs) = jacobiEig(m)
    val total = vals.sum
    val order = vals.indices.sortBy(i => (-vals(i), i)).take(PcaComps)
    order.zipWithIndex.flatMap { case (ei, comp) =>
      val raw = Array.tabulate(d)(dim => vecs(dim)(ei))
      // sign convention: the largest-|loading| dim (ties → first) positive
      val pivot = raw.indices.maxBy(i => (math.abs(raw(i)), -i))
      val sgn = if (raw(pivot) < 0.0) -1.0 else 1.0
      raw.indices.map(dim => (comp.toLong, dim.toLong, sgn * raw(dim),
        vals(ei), vals(ei) / total))
    }
  }

  def ePca(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = pcaFromGram(eGram(spark, dir)
      .select("dim_i", "dim_j", "gram").collect())
    spark.createDataset(rows)
      .toDF("comp", "dim", "loading", "eigval", "var_ratio")
      .orderBy("comp", "dim")
  }

  // -------------------------------------------------------- e_whiten

  /** e_whiten — whitening projection onto the [[ePca]] basis: every
    * corpus vector maps to z_c = (v_c · x) / √(λ_c / n) for the top
    * [[PcaComps]] components, so the TRAINING SAMPLE's second moment
    * in z-space is exactly the identity — the decorrelation step
    * ahead of OPQ rotation, Mahalanobis-style similarity, or
    * embedding-drift monitoring. (Uncentered moment, inheriting
    * [[eGram]]'s contract; subtract [[eCentroid]] means upstream for
    * covariance whitening proper.)
    *
    * Scale shape: the model (PcaComps·d loadings + eigenvalues) is a
    * bounded driver artifact embedded as PLAN LITERALS — like
    * [[eRproject]]'s sign matrix, nothing is shuffled or broadcast —
    * and the corpus pass is one narrow map (explicit per-component
    * multiply-add chains over element_at, ascending dim, fully
    * codegen). Scoring any corpus size is scan-bound; only the
    * training pull ([[eGram]] on its md5 sample) does distributed
    * work. Rows-only at the gate ([[ePca]]'s driver eigensolve has no
    * SQL twin); PipelineSpec pins the whitened sample's second moment
    * to the identity and bit-exact determinism. */
  def eWhiten(spark: SparkSession, dir: String): DataFrame = {
    // ONE Gram pass feeds both the eigensolve and the sample size
    // (calling ePca + eGram separately would run the distributed
    // Gram aggregation twice — measured ~1.7 s of the query at sf0.1)
    val gramRows = eGram(spark, dir)
      .select(col("dim_i"), col("dim_j"), col("gram"), col("n_vectors"))
      .collect()
    val pca = pcaFromGram(gramRows)
      .map(t => (t._1.toInt, t._2.toInt, t._3, t._4))
    val n = gramRows.head.getLong(3)
    val byComp = pca.groupBy(_._1).toSeq.sortBy(_._1)
    val zCols = byComp.map { case (c, rows) =>
      // A zero (or numerically negative) eigenvalue inside the kept
      // components — possible on a low-rank or degenerate Gram
      // sample — would whiten the whole corpus to Infinity/NaN
      // through the 1/scale divide. Fail loudly instead: a sample
      // whose top components are rank-deficient cannot support
      // whitening at this component count.
      require(rows.head._4 > 1e-12 * byComp.head._2.head._4.max(1.0),
        s"whitening component $c has non-positive eigenvalue " +
          s"${rows.head._4} — degenerate training sample; reduce the " +
          "component count or re-sample")
      val scale = math.sqrt(rows.head._4 / n)
      val dot = rows.sortBy(_._2).map { case (_, dim, v, _) =>
        element_at(col("embedding"), dim + 1).cast("double") * lit(v)
      }.reduceLeft(_ + _)
      stableRound(dot / lit(scale), 6).as(s"z$c")
    }
    Tables(spark, dir).embeddings
      .select(col("vec_id") +: zCols: _*)
      .select(col("vec_id"), posexplode(array(byComp.map(c => col(s"z${c._1}")): _*)))
      .select(col("vec_id"), col("pos").cast("long").as("comp"),
        col("col").as("z"))
      .orderBy("vec_id", "comp")
  }

  // ------------------------------------------------------ e_outliers

  /** Outlier threshold: a vector whose squared distance to its label
    * centroid exceeds this multiple of the label's mean squared
    * distance is flagged. */
  val OutlierFactor = 4.0

  /** e_outliers — per-vector EMBEDDING OUTLIER audit against the
    * label centroid: squared distance to the own-label exact
    * centroid, the label's mean squared distance, their ratio, and
    * the ≥ [[OutlierFactor]]× flag. The embedding-space quality
    * filter curation runs beside SemDeDup: far-from-centroid vectors
    * are mislabeled, OCR-garbled, or off-distribution documents —
    * prune or re-route them before they anchor an IVF cell or leak
    * through label-scoped dedup (d_semdedup's scoping assumes labels
    * cohere; e_silhouette says whether they do on average, this names
    * the individual offenders).
    *
    * Scale shape: centroids ride the exact hierarchical fold
    * ([[centroidOf]]); per-vector distance is a narrow explode + one
    * broadcast centroid attach + a per-vector (≤ dims) bounded fold;
    * the label means ride [[streamSubFold2]] (never a label-sized
    * row); the mean frame is labels-sized and broadcasts back. Two
    * corpus-linear passes, no corpus-keyed join. Float parity: x and
    * c are exact-chain doubles, (x−c)² spelled identically, per-
    * vector fold ORDER BY dim, label mean via the mirrored two-level
    * fold; ratio rounded, the flag compares identical doubles. */
  def eOutliers(spark: SparkSession, dir: String): DataFrame =
    outliersOf(spark, Tables(spark, dir).embeddings)

  /** The [[eOutliers]] core over any (vec_id, embedding, label)
    * frame — spec entry point for planted-outlier fixtures (the
    * synthetic corpus's unit-norm clustered embeddings keep every
    * ratio inside [0.9, 1.13], so the ≥4× flag is uniformly false at
    * the gate SFs — the ratio COLUMNS are the hash-checked substance,
    * and the flag's true branch is pinned in PipelineSpec on a
    * planted far vector, the q_broadcast_audit discipline). */
  private[graft] def outliersOf(spark: SparkSession, e: DataFrame): DataFrame = {
    val cents = centroidOf(spark, e)
      .select(col("label"), col("dim"), col("centroid"))
    val terms = e.select(col("label"), col("vec_id"), posexplode(col("embedding")))
      .select(col("label"), col("vec_id"), col("pos").cast("long").as("dim"),
        col("col").cast("double").as("x"))
      .join(broadcast(cents), Seq("label", "dim"))
      .select(col("label"), col("vec_id"), col("dim"),
        ((col("x") - col("centroid")) * (col("x") - col("centroid"))).as("t"))
    val d2 = terms.groupBy("label", "vec_id")
      .agg(sort_array(collect_list(struct(col("dim"), col("t")))).as("ts"))
      .select(col("label"), col("vec_id"),
        graft.functions.expr.FoldExpressions.sumArrayField(col("ts"), "t").as("d2"))
      .localCheckpoint(false) // feeds the label means AND the final attach
    val means = streamSubFold2(spark,
        d2.select(col("label").cast("int").as("label"), lit(0).as("zero"),
          pmod(col("vec_id"), lit(CentroidSubs.toLong)).cast("int").as("sub"),
          lit(0L).as("w"), col("d2").as("v")), "label", "zero")
      .groupBy("label")
      .agg(sum(col("n")).cast("long").as("nv"),
        sort_array(collect_list(struct(col("sub"), col("s")))).as("ss"))
      .select(col("label"),
        (graft.functions.expr.FoldExpressions.sumArrayField(col("ss"), "s")
          / col("nv")).as("mean_d2"))
    d2.join(broadcast(means), Seq("label"))
      .select(col("label").cast("long").as("label"), col("vec_id"),
        stableRound(col("d2"), 6).as("dist2"),
        stableRound(col("mean_d2"), 6).as("mean_dist2"),
        stableRound(col("d2") / col("mean_d2"), 4).as("ratio"),
        (col("d2") > col("mean_d2") * lit(OutlierFactor)).as("is_outlier"))
      .orderBy("vec_id")
  }

  val eOutliersSql: String =
    s"""WITH $centroidCellsSql,
       |cent AS (SELECT label, dim, total / n_vectors AS c FROM cells),
       |vv AS (
       |  SELECT label, vec_id, i - 1 AS dim, x::DOUBLE AS x
       |  FROM (SELECT label, vec_id, unnest(embedding) AS x,
       |        generate_subscripts(embedding, 1) AS i FROM embeddings) u),
       |term AS (
       |  SELECT vv.label, vv.vec_id, vv.dim, (vv.x - cent.c) * (vv.x - cent.c) AS t
       |  FROM vv JOIN cent USING (label, dim)),
       |d2 AS (
       |  SELECT label, vec_id,
       |    list_reduce(list_prepend(0.0, list(t ORDER BY dim)), (a, b) -> a + b) AS d2
       |  FROM term GROUP BY 1, 2),
       |msub AS (
       |  SELECT label, vec_id % $CentroidSubs AS sub, count(*)::BIGINT AS n,
       |    list_reduce(list_prepend(0.0, list(d2 ORDER BY d2)), (a, b) -> a + b) AS s
       |  FROM d2 GROUP BY 1, 2),
       |m AS (
       |  SELECT label, sum(n)::BIGINT AS nv,
       |    list_reduce(list_prepend(0.0, list(s ORDER BY sub)), (a, b) -> a + b) AS tot
       |  FROM msub GROUP BY label),
       |mm AS (SELECT label, tot / nv AS mean_d2 FROM m)
       |SELECT d2.label::BIGINT AS label, d2.vec_id,
       |  ${stableRoundSql("d2.d2", 6)} AS dist2,
       |  ${stableRoundSql("mm.mean_d2", 6)} AS mean_dist2,
       |  ${stableRoundSql("d2.d2 / mm.mean_d2", 4)} AS ratio,
       |  d2.d2 > mm.mean_d2 * $OutlierFactor AS is_outlier
       |FROM d2 JOIN mm USING (label)
       |ORDER BY vec_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e_normalize" -> eNormalize,
    "e_quantize" -> eQuantize,
    "e_centroid" -> eCentroid,
    "e_gram" -> eGram,
    "e_rproject" -> eRproject,
    "e_pca" -> ePca,
    "e_whiten" -> eWhiten,
    "e_silhouette" -> eSilhouette,
    "e_drift" -> eDrift,
    "e_outliers" -> eOutliers,
  )

  def oracles: Map[String, String] = Map(
    "e_normalize" -> eNormalizeSql,
    "e_quantize" -> eQuantizeSql,
    "e_centroid" -> eCentroidSql,
    "e_gram" -> eGramSql,
    "e_rproject" -> eRprojectSql,
    "e_silhouette" -> eSilhouetteSql,
    "e_drift" -> eDriftSql,
    "e_outliers" -> eOutliersSql,
    // e_pca: no SQL eigensolver exists — rows-only at the gate;
    // PipelineSpec carries the correctness burden (see ePca scaladoc).
  )
}
