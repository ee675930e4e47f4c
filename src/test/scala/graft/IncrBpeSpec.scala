package graft

import org.apache.spark.sql.functions._
import graft.operators.Tokenizer

/** Incremental BPE training: the maintained pair-count table must
  * reproduce the full per-round recompute BIT-IDENTICALLY (merge
  * sequence and pair counts), and the Zipf measurement quantifies the
  * claim that rounds touch a shrinking vocabulary slice — the
  * asymptotic argument for production merge counts (SURVEY §8 records
  * the numbers). */
class IncrBpeSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def train(wc: Map[String, Long], k: Int) = {
    val df = wc.toSeq.toDF("word", "count")
    val full = Tokenizer.bpeTrainFromCounts(spark, df, k)
      .as[(Long, String, String, String, Long)].collect().toSeq
    val incr = Tokenizer.bpeTrainIncremental(spark, df, k)
      .as[(Long, String, String, String, Long)].collect().toSeq
    (full, incr)
  }

  test("incremental equals full on the classic and overlap fixtures") {
    val (f1, i1) = train(Map("hug" -> 10L, "pug" -> 5L, "pun" -> 12L,
      "bun" -> 4L, "hugs" -> 5L), 8)
    assert(f1 == i1, s"classic fixture diverged:\n full=$f1\n incr=$i1")
    val (f2, i2) = train(Map("aaaa" -> 3L, "abab" -> 2L, "aab" -> 5L), 6)
    assert(f2 == i2, s"overlap fixture diverged:\n full=$f2\n incr=$i2")
  }

  test("incremental equals full on the corpus word table") {
    val a = Tokenizer.tBpeTrain(spark, sf)
      .as[(Long, String, String, String, Long)].collect().toSeq
    val b = Tokenizer.tBpeIncr(spark, sf)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(a == b, s"corpus training diverged:\n full=$a\n incr=$b")
  }

  test("Zipf vocabulary: rounds touch a shrinking slice, results identical") {
    // A vocabulary with real character structure: Zipf-weighted words
    // over a 12-letter alphabet, lengths 3-10 — enough pair diversity
    // that later merges are rare, which is exactly the regime where
    // incremental maintenance pays.
    val rnd = new scala.util.Random(20260814L)
    val alpha = "etaoinshrdlu"
    val nWords = sys.env.get("GRAFT_BPE_WORDS").map(_.toInt).getOrElse(1500)
    val k = sys.env.get("GRAFT_BPE_MERGES").map(_.toInt).getOrElse(24)
    val wc = (0 until nWords).map { i =>
      val len = 3 + rnd.nextInt(8)
      val w = Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString
      w -> (1L + (nWords / (i + 1)).toLong) // Zipf-ish counts
    }.groupMapReduce(_._1)(_._2)(_ + _)
    val df = wc.toSeq.toDF("word", "count").localCheckpoint(false)

    val t0 = System.nanoTime()
    val full = Tokenizer.bpeTrainFromCounts(spark, df, k)
      .as[(Long, String, String, String, Long)].collect().toSeq
    val tFull = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val incr = Tokenizer.bpeTrainIncremental(spark, df, k)
      .as[(Long, String, String, String, Long)].collect().toSeq
    val tIncr = (System.nanoTime() - t1) / 1e9
    assert(full == incr, "Zipf training diverged")

    // the scale metric: words the incremental path RECOUNTS per round
    // (those containing the winning pair) vs the full path's whole
    // vocabulary — row volume, not wall-clock (job overhead dominates
    // at test scale; the ratio is what grows with vocabulary)
    var vocab: Map[Vector[String], Long] =
      wc.map { case (w, c) => w.toVector.map(_.toString) -> c }
    var touched = 0L
    full.foreach { case (_, l, r, m, _) =>
      val hit = vocab.keys.filter(t =>
        t.zip(t.tail).contains((l, r))).toSeq
      touched += hit.size
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
    }
    val fullRows = full.size.toLong * wc.size
    info(f"vocab=${wc.size} merges=$k: incremental recounts $touched rows " +
      f"vs full $fullRows (${fullRows.toDouble / touched}%.1fx fewer); " +
      f"wall full=$tFull%.1fs incr=$tIncr%.1fs")
    assert(touched < fullRows / 2,
      s"incremental touched $touched of $fullRows — no slice shrinkage")
  }
}
