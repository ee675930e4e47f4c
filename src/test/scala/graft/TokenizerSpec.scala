package graft

import org.apache.spark.sql.functions._
import graft.operators.Tokenizer

/** BPE trainer semantics: the distributed merge loop must reproduce
  * an independent driver-side reference implementation (count pairs
  * over the word-frequency table, argmax with the (count desc, left
  * asc, right asc) tie-break, greedy left-to-right fuse), and the
  * corpus-level run must be deterministic — the gate records
  * t_bpe_train rows-only, so this spec is the correctness burden. */
class TokenizerSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  /** Independent reference BPE over a word-count map. The fuse is the
    * textbook index scan (i += 2 on a match), deliberately NOT the
    * operator's fold formulation — agreement is the point. */
  private def refBpe(words: Map[String, Long], k: Int): Seq[(Long, String, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, c) => w.toVector.map(_.toString) -> c }
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    var rank = 0L
    var done = false
    while (rank < k && !done) {
      val counts = vocab.toSeq.flatMap { case (toks, c) =>
        toks.zip(toks.tail).map(p => p -> c)
      }.groupMapReduce(_._1)(_._2)(_ + _)
      if (counts.isEmpty) done = true
      else {
        val ((l, r), n) = counts.minBy { case ((l, r), n) => (-n, l, r) }
        val m = l + r
        out += ((rank, l, r, m, n))
        vocab = vocab.map { case (toks, c) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
              b += m; i += 2
            } else { b += toks(i); i += 1 }
          }
          b.result() -> c
        }
        rank += 1L
      }
    }
    out.result()
  }

  test("bpe merges equal the reference on the classic fixture, argmax and fuse included") {
    // the HuggingFace-tutorial-style corpus: first merge must be
    // (u,g) with count 20
    val fixture = Map("hug" -> 10L, "pug" -> 5L, "pun" -> 12L,
      "bun" -> 4L, "hugs" -> 5L)
    val wc = fixture.toSeq.toDF("word", "count")
    val got = Tokenizer.bpeTrainFromCounts(spark, wc, 8)
      .as[(Long, String, String, String, Long)].collect().toSeq
    val expect = refBpe(fixture, 8)
    assert(got.head == ((0L, "u", "g", "ug", 20L)), s"first merge: ${got.head}")
    assert(got == expect, s"merge sequences diverge:\n got=$got\n exp=$expect")
  }

  test("greedy fuse handles overlap and rescan cases like the reference") {
    // aaaa: merge (a,a) pairs non-overlapping left-to-right; abab and
    // aab exercise fused-tail and skip-then-match paths
    val fixture = Map("aaaa" -> 3L, "abab" -> 2L, "aab" -> 5L)
    val wc = fixture.toSeq.toDF("word", "count")
    val got = Tokenizer.bpeTrainFromCounts(spark, wc, 6)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(got == refBpe(fixture, 6), s"overlap fixture diverges: $got")
  }

  test("encode replays training: corpus token total equals the reference") {
    // Reference: refBpe-style sequential application of the learned
    // merges to every distinct word (textbook index scan), then
    // Σ count·|toks|. The operator's per-doc n_tokens must sum to
    // exactly that — checks the chained fold encode AND the per-doc
    // join/sum against an implementation sharing neither.
    val merges = Tokenizer.tBpeTrain(spark, sf)
      .as[(Long, String, String, String, Long)].collect().toSeq
      .map { case (_, l, r, m, _) => (l, r, m) }
    val wc = graft.core.Tables(spark, sf).documents
      .select(explode(graft.functions.TextFunctions.words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("count"))
      .as[(String, Long)].collect().toMap
    def encode(w: String): Vector[String] = {
      var toks = w.toVector.map(_.toString)
      merges.foreach { case (l, r, m) =>
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
            b += m; i += 2
          } else { b += toks(i); i += 1 }
        }
        toks = b.result()
      }
      toks
    }
    val expectTokens = wc.map { case (w, c) => c * encode(w).length }.sum
    val expectWords = wc.values.sum
    val got = Tokenizer.tBpeEncode(spark, sf)
      .agg(sum(col("n_tokens")), sum(col("n_words"))).head()
    assert(got.getLong(0) == expectTokens,
      s"token total ${got.getLong(0)} != reference $expectTokens")
    assert(got.getLong(1) == expectWords)
    // compression is real: merges learned on this corpus must shorten it
    assert(expectTokens < wc.map { case (w, c) => c * w.length }.sum)
  }

  test("fertility rollup is bit-identical to an independent per-doc recompute") {
    // Independent recompute: collect the per-doc accounting from
    // t_bpe_encode's OUTPUT (integer columns only), attach lang/source
    // driver-side, and roll up with plain Scala arithmetic — shares
    // the tokenizer but none of the rollup plan (join/groupBy/round).
    val meta = graft.core.Tables(spark, sf).documents
      .select(col("doc_id"), col("lang"), col("source"))
      .as[(Long, String, String)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    val perDoc = Tokenizer.tBpeEncode(spark, sf)
      .select("doc_id", "n_words", "n_tokens", "n_chars")
      .as[(Long, Long, Long, Long)].collect()
    val want = perDoc.groupBy(d => meta(d._1)).map { case ((lang, src), ds) =>
      val (nw, nt, nc) = (ds.map(_._2).sum, ds.map(_._3).sum, ds.map(_._4).sum)
      def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
      (lang, src) -> ((ds.length.toLong, nw, nt, nc,
        r6(nt.toDouble / nw), r6(nc.toDouble / nt)))
    }
    val got = Tokenizer.tBpeFertility(spark, sf)
      .as[(String, String, Long, Long, Long, Long, Double, Double)]
      .collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4, t._5, t._6, t._7, t._8))).toMap
    assert(got == want, s"rollup diverged:\n got=$got\nwant=$want")
    // every (lang, source) segment present and docs conserved
    assert(got.values.map(_._1).sum == perDoc.length.toLong)
    // fertility is a real signal: ≥ 1 token per word everywhere
    got.values.foreach { v => assert(v._5 >= 1.0, s"fertility < 1: $v") }
  }

  test("corpus training is deterministic and structurally sound") {
    val a = Tokenizer.tBpeTrain(spark, sf)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(a.size == Tokenizer.BpeMerges)
    assert(a.map(_._1) == (0L until Tokenizer.BpeMerges.toLong), "ranks not dense")
    a.foreach { case (rk, l, r, m, n) =>
      assert(m == l + r, s"rank $rk merged != left+right")
      assert(n > 0, s"rank $rk nonpositive count")
    }
    val b = Tokenizer.tBpeTrain(spark, sf)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(a == b, "re-run diverged")
  }
}
