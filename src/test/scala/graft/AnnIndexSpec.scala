package graft

import graft.operators.{Similarity, VectorIndex}

/** The build-once/probe-many contract of the persisted ANN index
  * (VERDICT r7 #2): probes served from the [[VectorIndex]] parquet
  * sidecars must (a) run ZERO training passes, (b) read the codes
  * sidecar instead of re-coding the corpus, and (c) be bit-identical
  * to the in-session-trained formulation — so the recall bounds
  * KmeansRecallSpec establishes transfer to the persisted path
  * verbatim. */
class AnnIndexSpec extends SparkSpec {

  test("build writes both sidecars once; rebuild is a no-op") {
    val path = VectorIndex.build(spark, sf)
    assert(new java.io.File(path, "centroids.parquet").exists(),
      s"centroids sidecar missing under $path")
    assert(new java.io.File(path, "codes.parquet").exists(),
      s"codes sidecar missing under $path")
    // second build: the _done marker short-circuits — no training pass
    Similarity.trainCount.set(0L)
    assert(VectorIndex.build(spark, sf) == path)
    assert(Similarity.trainCount.get() == 0L,
      "rebuild of an existing index ran a training pass")
  }

  test("persisted probes run zero training passes and scan the sidecar") {
    val path = VectorIndex.build(spark, sf) // ensure built (and cached models warm is NOT assumed)
    Similarity.trainCount.set(0L)
    val ivf = Similarity.sAnnIvf(spark, sf)
    val pq = Similarity.sAnnPq(spark, sf)
    val ivfpq = Similarity.sAnnIvfPq(spark, sf)
    // materialize all three probe pipelines end-to-end
    assert(ivf.count() > 0 && pq.count() > 0 && ivfpq.count() > 0)
    assert(Similarity.trainCount.get() == 0L,
      s"persisted probe path ran ${Similarity.trainCount.get()} training pass(es)")
    // the corpus side of each probe is a scan of the codes sidecar —
    // no cell-assignment / argmin-coding expressions over the corpus
    Seq("s_ann_ivf" -> ivf, "s_ann_pq" -> pq, "s_ann_ivfpq" -> ivfpq).foreach {
      case (name, df) =>
        // the FileScan location string is truncated in toString, so
        // match the scratch stem rather than the full sidecar path
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("annindex"),
          s"$name plan does not scan the codes sidecar:\n${plan.take(1500)}")
    }
  }

  test("append-delta coding is bit-identical to a frozen-codebook recode") {
    // The growing-corpus maintenance path: new vectors are coded
    // against the FROZEN models and appended (work ∝ |delta|, no
    // retraining). While the codebooks are frozen this must equal
    // recoding the grown corpus from scratch through the same select.
    import org.apache.spark.sql.functions.col
    val dirPath = java.nio.file.Files.createTempDirectory("graft_annappend_")
    val dir = dirPath.toString
    try {
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val base = emb.filter(col("vec_id") < 400)
      val delta = emb.filter(col("vec_id") >= 400)
      assert(delta.count() > 0, "fixture: the delta half must be non-empty")
      base.write.parquet(s"$dir/embeddings.parquet")
      val path = VectorIndex.build(spark, dir)
      Similarity.trainCount.set(0L)
      VectorIndex.appendCodes(spark, path, delta)
      assert(Similarity.trainCount.get() == 0L,
        "append-delta coding ran a training pass")
      val got = VectorIndex.codes(spark, path)
        .orderBy("vec_id").collect().toSeq
      val (cells, book) = VectorIndex.models(spark, path)
      val want = Similarity.codeFrame(
          Similarity.withUnit(emb, "embedding", "u"), cells, book)
        .orderBy("vec_id").collect().toSeq
      assert(got.length == emb.count())
      assert(got == want,
        "appended codes diverge from a frozen-codebook recode of the grown corpus")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq.reverse
        .foreach(p => { java.nio.file.Files.deleteIfExists(p): Unit })
    }
  }

  test("sidecar-served probes are bit-identical to in-session training") {
    for ((name, f) <- Seq[(String, Boolean => org.apache.spark.sql.DataFrame)](
        "s_ann_ivf" -> (p => Similarity.sAnnIvfFrom(spark, sf, p)),
        "s_ann_pq" -> (p => Similarity.sAnnPqFrom(spark, sf, p)),
        "s_ann_ivfpq" -> (p => Similarity.sAnnIvfPqFrom(spark, sf, p)))) {
      val persisted = f(true).collect().toSeq
      val inSession = f(false).collect().toSeq
      assert(persisted == inSession,
        s"$name: persisted and in-session results diverge")
    }
  }

  test("st_ann_ingest: streamed segment ≡ batch frozen-codebook coding, exactly-once on re-run") {
    import org.apache.spark.sql.functions._
    import graft.streaming.VectorStream
    val out = VectorStream.stAnnIngest(spark, sf).collect().toSeq
    val path = VectorStream.baseIndex(spark, sf)
    // the streamed delta segment must be bit-identical to coding the
    // same delta in batch against the same frozen models — the
    // appendCodes parity contract carried over the streaming boundary
    val (cells, book) = VectorIndex.models(spark, path)
    val delta = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(pmod(col("vec_id"), lit(VectorStream.DeltaMod)) === 0L)
    Similarity.trainCount.set(0L)
    val want = Similarity.codeFrame(
        Similarity.withUnit(delta, "embedding", "u"), cells, book)
      .orderBy("vec_id").collect().toSeq
    assert(want.nonEmpty, "fixture: the streamed delta slice must be non-empty")
    val got = spark.read.parquet(s"$path/codes_delta.parquet")
      .orderBy("vec_id").collect().toSeq
    assert(got == want,
      "streamed delta segment diverges from the batch frozen-codebook coding")
    // models were trained on the BASE slice only — never the delta
    val baseIds = VectorIndex.codes(spark, path)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(baseIds.forall(_ % VectorStream.DeltaMod != 0L),
      "a delta vector leaked into the base index")
    // output is the per-cell recount of the grown (base + delta) index
    assert(out.map(r => r.getAs[Long]("n_total")).sum ==
      baseIds.size.toLong + want.length.toLong)
    assert(out.forall(r =>
      r.getAs[Long]("n_base") + r.getAs[Long]("n_delta") == r.getAs[Long]("n_total")))
    // re-attaching the consumer reprocesses NOTHING: the file sink's
    // commit log already holds the source, so the segment and the
    // report are unchanged (the exactly-once contract)
    val again = VectorStream.stAnnIngest(spark, sf).collect().toSeq
    assert(again == out, "re-run changed the ingest report")
    assert(spark.read.parquet(s"$path/codes_delta.parquet").count() ==
      want.length.toLong, "re-run appended duplicate codes")
    assert(Similarity.trainCount.get() == 0L,
      "streamed ingest ran a training pass after the base build")
  }
}
