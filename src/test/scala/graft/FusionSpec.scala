package graft

import org.apache.spark.sql.execution.FormattedMode
import graft.core.Tables
import graft.operators.Retrieval

/** Hybrid-fusion variants beyond the shared DuckDB oracle: the fused
  * rankings are recomputed driver-side from the raw arm rank lists
  * (an independent implementation of weighting + RRF + re-rank), the
  * learned weights are pinned to the arms' weak-relevance hit shares,
  * and the learned pipeline's plan stays rank-list-sized. */
class FusionSpec extends SparkSpec {

  private val K = Retrieval.RrfK
  private val TopK = Retrieval.Bm25TopK

  private def stable6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Driver-side reference fusion over collected arm maps. */
  private def refFuse(lex: Map[(Long, Long), Long], vec: Map[(Long, Long), Long],
      wl: Double, wv: Double): Seq[(Long, Long, Long, Double)] = {
    val pairs = (lex.keySet ++ vec.keySet).toSeq
    val scored = pairs.map { case (q, d) =>
      val s = lex.get((q, d)).map(r => wl / (K + r)).getOrElse(0.0) +
        vec.get((q, d)).map(r => wv / (K + r)).getOrElse(0.0)
      (q, d, stable6(s))
    }
    scored.groupBy(_._1).toSeq.flatMap { case (q, ds) =>
      ds.sortBy { case (_, d, s) => (-s, d) }.take(TopK).zipWithIndex
        .map { case ((_, d, s), i) => (q, i + 1L, d, s) }
    }.sortBy(t => (t._1, t._2))
  }

  private def armMap(df: org.apache.spark.sql.DataFrame,
      rankCol: String): Map[(Long, Long), Long] =
    df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("doc_id")) ->
      r.getAs[Long](rankCol)).toMap

  private lazy val lex = armMap(Retrieval.lexArm(spark, sf), "rl")
  private lazy val vec = armMap(Retrieval.vecArm(spark, sf), "rv")
  private lazy val srcOf = Tables(spark, sf).documents
    .select("doc_id", "source").collect()
    .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap

  private def collectFused(name: String): Seq[(Long, Long, Long, Double)] =
    SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rk"),
        r.getAs[Long]("doc_id"), r.getAs[Double]("rrf"))).toSeq

  test("weighted RRF matches an independent recompute at its fixed weights") {
    val expected = refFuse(lex, vec, Retrieval.WrrfLex, Retrieval.WrrfVec)
    val actual = collectFused("t_hybrid_wrrf")
    assert(actual == expected)
    // and the weights matter: the lexical-heavy fusion differs from
    // uniform RRF on this corpus (otherwise the op demonstrates nothing)
    assert(actual != collectFused("t_hybrid_rrf"),
      "0.7/0.3 fusion collapsed to the uniform ranking")
  }

  test("learned fusion weights are the arms' weak-relevance hit shares") {
    val hl = lex.count { case ((q, d), _) => srcOf(q) == srcOf(d) }
    val hv = vec.count { case ((q, d), _) => srcOf(q) == srcOf(d) }
    assert(hl + hv > 0, "gate corpus produced no weak-relevance hits")
    val wl = hl.toDouble / (hl + hv)
    val wv = hv.toDouble / (hl + hv)
    assert(wl > 0.0 && wl < 1.0, s"degenerate learned weight $wl")
    val expected = refFuse(lex, vec, wl, wv)
    assert(collectFused("t_hybrid_learned") == expected)
  }

  test("second-stage rerank matches an independent containment recompute") {
    // reference: containment = |qwords ∩ dwords| / |qwords| over the
    // normalized word sets, re-ranked by (cont desc, rrf desc, doc_id)
    val wordSets = Tables(spark, sf).documents
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.TextFunctions.words(
          org.apache.spark.sql.functions.col("text")).as("ws"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[String]]("ws").toSet).toMap
    val fused = collectFused("t_hybrid_rrf")
    val expected = fused.groupBy(_._1).toSeq.flatMap { case (q, rows) =>
      val qs = wordSets(q)
      rows.map { case (_, _, d, rrf) =>
        (q, d, stable6(qs.intersect(wordSets(d)).size.toDouble / qs.size), rrf)
      }.sortBy { case (_, d, c, rrf) => (-c, -rrf, d) }.zipWithIndex
        .map { case ((_, d, c, _), i) => (q, i + 1L, d, c) }
    }.sortBy(t => (t._1, t._2))
    val actual = SparkEntry.queries("t_rerank")(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rk"),
        r.getAs[Long]("doc_id"), r.getAs[Double]("cont"))).toSeq
    assert(actual == expected)
    // the rerank must actually move something on the gate corpus —
    // otherwise the second stage demonstrates nothing
    assert(actual.map(t => (t._1, t._3)) != fused.map(t => (t._1, t._3)),
      "containment rerank left every fused ranking unchanged")
  }

  test("learned fusion trains and fuses on rank lists — corpus never re-joined") {
    spark.catalog.clearCache()
    val p = SparkEntry.queries("t_hybrid_learned")(spark, sf)
      .queryExecution.explainString(FormattedMode)
    // tolerated nested loops: the two 1-row weight cross joins
    // (hl×hv and the attach) plus the vector arm's ≠-condition
    // broadcast join, which the formatted explain re-prints inside
    // the cached arm's InMemoryRelation dump
    val bnlj = p.linesIterator.count(_.contains("- BroadcastNestedLoopJoin"))
    assert(bnlj <= 4 && !p.contains("CartesianProduct"),
      s"fusion degenerated beyond the tolerated nested loops ($bnlj):\n${p.take(2500)}")
    assert(p.contains("FullOuter"), s"rank-list fusion join missing:\n${p.take(2000)}")
    // hit counting joins the (doc_id, source) dimension via broadcast
    assert(p.contains("BroadcastHashJoin"),
      s"weak-label dimension join not broadcast:\n${p.take(2000)}")
    // the arms are cached rank lists — each expensive arm pipeline
    // materializes once for hit counting and is REUSED by the fusion
    assert(p.contains("InMemoryTableScan"),
      s"arm rank lists not cached — arms would run twice:\n${p.take(2000)}")
  }

  test("t_ndcg matches an independent driver recompute; bounded by 1") {
    val docs = Tables(spark, sf).documents
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val srcSize = docs.values.groupBy(identity).map { case (s, v) => s -> v.size }
    val ln2 = math.log(2.0)
    def refNdcg(arm: Map[(Long, Long), Long]): Map[Long, (Long, Double, Double, Double)] =
      arm.groupBy(_._1._1).map { case (q, rs) =>
        val nRel = srcSize(docs(q)) - 1L
        // DCG folds rank-ascending, matching the operator's sorted fold
        val dcg = rs.toSeq.sortBy(_._2).foldLeft(0.0) { case (a, ((_, d), r)) =>
          a + (if (docs(d) == docs(q)) ln2 / math.log((r + 1).toDouble) else 0.0)
        }
        val m = math.min(Retrieval.Bm25TopK.toLong, nRel).toInt
        val idcg = (1 to Retrieval.Bm25TopK).foldLeft(0.0) { (a, i) =>
          a + (if (i <= m) ln2 / math.log((i + 1).toDouble) else 0.0)
        }
        val ndcg = if (idcg > 0) stable6(dcg / idcg) else 0.0
        q -> (nRel, stable6(dcg), stable6(idcg), ndcg)
      }
    val want = refNdcg(lex).map { case (q, v) => ("lex", q) -> v } ++
      refNdcg(vec).map { case (q, v) => ("vec", q) -> v }
    val got = Retrieval.tNdcg(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) =>
      assert(v == want(k), s"$k: got $v want ${want(k)}")
      assert(v._4 >= 0.0 && v._4 <= 1.0, s"$k ndcg out of [0,1]")
    }
    // the fixture must exercise actual relevance (not all-zero DCG)
    assert(got.values.exists(_._2 > 0.0), "degenerate: no relevant hits at all")
  }
}
