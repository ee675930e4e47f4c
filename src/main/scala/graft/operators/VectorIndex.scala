package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted ANN index sidecars — the [[graft.storage.IndexedStore]]
  * posting/Bloom sidecar discipline applied to vectors: a production
  * corpus trains its vector index ONCE at build time and serves every
  * probe from the stored artifacts (what FAISS's write_index / the
  * reference's add-an-index-then-probe surface, lib.rs:195-205, are
  * for), instead of re-running k-means and the coding pass per
  * session.
  *
  * Two parquet sidecars under one scratch root (fingerprinted against
  * the source testdata and `_done`-marked, the [[StorageOps.scratch]]
  * / [[StorageOps.buildOnce]] discipline):
  *
  *  - `centroids.parquet` — the MODELS: IVF cell centroids
  *    (kind='cell') and per-subspace PQ codebook entries (kind='pq'),
  *    a few hundred rows loaded driver-side once per JVM ([[models]]).
  *  - `codes.parquet` — the INDEX FRAME ([[Similarity.codeFrame]]'s
  *    exact select): per corpus vector its home cell id, unit vector
  *    (the IVF-flat inverted-file payload) and PQ codes. At 10⁹
  *    vectors this is the RAM-resident 8 B/vector code table plus the
  *    float payload the exact rescore tier reads — probes scan THIS,
  *    never the raw corpus.
  *
  * Training is bit-deterministic (md5-ordered bounded sample,
  * sequential Lloyd — [[Similarity.trainedModels]]) and doubles
  * round-trip parquet exactly, so sidecar-served probes are
  * bit-identical to in-session-trained ones; [[graft.AnnIndexSpec]]
  * pins that parity and the zero-training-pass probe contract.
  */
object VectorIndex {

  /** Index-format tag folded into the scratch name: the source
    * fingerprint covers the DATA, this covers the TRAINING — every
    * constant the models depend on, plus a version literal to bump on
    * any algorithmic change to lloydIp / the sampling / the coding
    * (without it, a code change would be served a stale index trained
    * by the old code wherever tmpdir outlives the build). */
  private[graft] def formatTag: String = {
    import Similarity._
    s"annindex_v1_i${PqKmeansIters}_c${IvfCells}_" +
      s"${PqSubspaces}x${PqCodebook}_s$PqTrainSample"
  }

  /** Build the sidecars once per (testdata generation, training
    * format, sf dir); returns the index root. Subsequent calls (and
    * sessions, until the source parquet or the training constants
    * change) see the `_done` marker and return immediately —
    * build-once/probe-many. */
  def build(spark: SparkSession, dir: String): String = {
    val path = StorageOps.scratch(formatTag, dir)
    StorageOps.buildOnce(path) { writeSidecars(spark, dir, path) }
    path
  }

  /** Train models over `srcDir`'s embeddings table and write both
    * sidecars under `path` — the [[build]] body, exposed so a caller
    * with its own scratch root (the streaming ingest's base-slice
    * index) can host the sidecars INSIDE that root instead of nesting
    * a second fingerprinted path under the first (nested roots embed
    * the outer fingerprint in their sweep stem and escape
    * [[StorageOps]]'s stale-sibling sweep forever). */
  private[graft] def writeSidecars(spark: SparkSession, srcDir: String,
      path: String): Unit = {
    val e = Similarity.withUnit(Similarity.embSpread(spark, srcDir), "embedding", "u")
    val (cells, book) = Similarity.trainedModels(e, Similarity.PqKmeansIters)
    val centRows: Seq[(String, Int, Int, Seq[Double])] =
      cells.toSeq.zipWithIndex.map { case (c, i) => ("cell", -1, i, c) } ++
        (0 until Similarity.PqSubspaces).flatMap { m =>
          book(m).toSeq.zipWithIndex.map { case ((cv, _), i) => ("pq", m, i, cv) }
        }
    val s = spark
    import s.implicits._
    centRows.toDF("kind", "m", "cid", "vec")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids.parquet")
    Similarity.codeFrame(e, cells, book)
      .write.mode("overwrite").parquet(s"$path/codes.parquet")
  }

  /** Driver-side model cache, keyed by the index root. The scratch
    * path embeds a fingerprint of the source parquet and training is
    * deterministic, so path ⟹ content — the stale-identity cache
    * audit class (SURVEY §10j.3c) is satisfied by construction. */
  private val modelCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Array[Seq[Double]], Similarity.PqBook)]

  /** Load (IVF cells, PQ codebook) from `path`'s centroids sidecar —
    * a few hundred rows, one small read per JVM per index. The ½|c|²
    * ADC terms are recomputed with the identical sequential op chain
    * [[Similarity.trainedModels]] used, so they are bit-equal. */
  def models(spark: SparkSession, path: String): (Array[Seq[Double]], Similarity.PqBook) = {
    if (modelCache.containsKey(path)) graft.core.CacheStats.hit()
    modelCache.computeIfAbsent(path, _ => {
      val rows = spark.read.parquet(s"$path/centroids.parquet")
        .select("kind", "m", "cid", "vec").collect()
      val cells = rows.filter(_.getString(0) == "cell").sortBy(_.getInt(2))
        .map(_.getSeq[Double](3): Seq[Double])
      val book: Similarity.PqBook = Array.tabulate(Similarity.PqSubspaces) { m =>
        rows.filter(r => r.getString(0) == "pq" && r.getInt(1) == m)
          .sortBy(_.getInt(2))
          .map { r =>
            val cv: Seq[Double] = r.getSeq[Double](3)
            (cv, 0.5 * cv.map(x => x * x).sum)
          }
      }
      require(cells.length == Similarity.IvfCells &&
        book.forall(_.length == Similarity.PqCodebook),
        s"ANN index at $path is malformed: ${cells.length} cells, " +
          s"codebook sizes ${book.map(_.length).mkString(",")}")
      (cells, book)
    })
  }

  /** The persisted index frame (vec_id, u, cid, c0..c{M-1}) as a lazy
    * scan of the codes sidecar. */
  def codes(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/codes.parquet")

  /** APPEND-DELTA index maintenance: code `delta` (vec_id, embedding
    * — new vectors, caller guarantees ids disjoint from the indexed
    * corpus) against the FROZEN models and append to the codes
    * sidecar. Work ∝ |delta|; the codebooks are untouched — the
    * d_dedup_incr incremental discipline applied to the vector index,
    * and exactly how FAISS-style deployments grow an IVF/PQ index
    * between retrains (add_with_ids against a trained quantizer).
    * While the codebooks are frozen this is bit-identical to recoding
    * the grown corpus from scratch ([[graft.AnnIndexSpec]] pins it);
    * when corpus drift makes the frozen cells/codebooks stale, the
    * move is a rebuild — delete the index root, [[build]] again. */
  def appendCodes(spark: SparkSession, path: String, delta: DataFrame): Unit = {
    val (cells, book) = models(spark, path)
    val e = Similarity.withUnit(delta, "embedding", "u")
    Similarity.codeFrame(e, cells, book)
      .write.mode("append").parquet(s"$path/codes.parquet")
  }
}
