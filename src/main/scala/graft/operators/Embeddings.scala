package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
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
    * The norm column is referenced inside the per-element lambda;
    * Catalyst's CollapseProject may inline the norm fold into each
    * element (same trade [[Similarity.withUnit]] accepts) — the fold
    * is a codegen'd 64-element loop, so the worst case is one extra
    * in-register pass per element, never a shuffle or a scan.
    *
    * A zero vector normalizes to NaNs in BOTH engines (0.0/0.0 under
    * identical IEEE rules) — no special-casing needed for parity. */
  def eNormalize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
    e.withColumn("l2_norm", sqrt(dot(col("embedding"), col("embedding"))))
      .select(col("vec_id"), col("l2_norm"),
        transform(col("embedding"), x => x.cast("double") / col("l2_norm")).as("unit"))
      .orderBy("vec_id")
  }

  val eNormalizeSql: String =
    """WITH n AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_reduce(
      |      list_prepend(0.0, list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)),
      |      (a, b) -> a + b)) AS l2_norm
      |  FROM embeddings)
      |SELECT vec_id, l2_norm,
      |  list_transform(embedding, x -> x::DOUBLE / l2_norm) AS unit
      |FROM n ORDER BY vec_id""".stripMargin

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
    val amax = aggregate(
      transform(col("embedding"), x => abs(x.cast("double"))),
      lit(0.0), (a, x) => greatest(a, x))
    e.withColumn("abs_max", amax)
      .select(col("vec_id"), col("abs_max"),
        transform(col("embedding"), x =>
          when(col("abs_max") === 0.0, lit(0))
            .otherwise(floor(x.cast("double") / col("abs_max") * lit(QuantLevels) + lit(0.5))
              .cast("int"))).as("q8"))
      .orderBy("vec_id")
  }

  val eQuantizeSql: String =
    s"""WITH m AS (
       |  SELECT vec_id, embedding,
       |    list_reduce(
       |      list_prepend(0.0, list_transform(embedding, x -> abs(x::DOUBLE))),
       |      (a, b) -> greatest(a, b)) AS abs_max
       |  FROM embeddings)
       |SELECT vec_id, abs_max,
       |  list_transform(embedding, x ->
       |    CASE WHEN abs_max = 0.0 THEN 0
       |         ELSE CAST(floor(x::DOUBLE / abs_max * $QuantLevels + 0.5) AS INTEGER)
       |    END) AS q8
       |FROM m ORDER BY vec_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e_normalize" -> eNormalize,
    "e_quantize" -> eQuantize,
  )

  def oracles: Map[String, String] = Map(
    "e_normalize" -> eNormalizeSql,
    "e_quantize" -> eQuantizeSql,
  )
}
