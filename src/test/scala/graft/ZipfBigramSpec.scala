package graft

import org.apache.spark.sql.functions.col
import graft.operators.Classify

/** The bigram-feature measurement: on a fixture whose two classes are
  * UNIGRAM-IDENTICAL (same word multiset per doc) but bigram-disjoint
  * (word order reversed), the unigram classifier cannot beat chance
  * while the bigram classifier separates — the signal `graft.classify
  * .features=bigram` exists to capture. Recorded numbers live in the
  * assertions; SURVEY §2 cites them. */
class ZipfBigramSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private val PerClass = 24

  // class 1: "alpha beta gamma" cycles; class 0: the reversed cycle —
  // identical unigram counts, disjoint bigram sets
  private def fixture(): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val rows = (0 until PerClass).flatMap { i =>
      Seq((i.toLong, Seq.fill(10)("alpha beta gamma").mkString(" "), 1),
        ((PerClass + i).toLong, Seq.fill(10)("gamma beta alpha").mkString(" "), 0))
    }
    val docs = rows.map(r => (r._1, r._2)).toDF("doc_id", "text")
    val labels = rows.map(r => (r._1, 30L, r._3)).toDF("doc_id", "n_words", "y")
    (docs, labels)
  }

  private def accuracyAndLoss(mode: String): (Double, Double) = {
    val (docs, labels) = fixture()
    val feats = Classify.featuresOf(docs, labels, mode).localCheckpoint(false)
    val n = 2L * PerClass
    val m = Classify.train(spark, feats, n)
    val byDoc = feats.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .groupBy(_._1)
    val correct = byDoc.count { case (_, rows) =>
      val margin = rows.map { case (_, b, x, _) => x * m.weights(b.toInt) }.sum
      val pred = if (1.0 / (1.0 + math.exp(-margin)) >= 0.5) 1 else 0
      pred == rows.head._4
    }
    (correct.toDouble / byDoc.size, m.losses.last)
  }

  test("bigram features separate an order-only signal unigrams cannot") {
    val (uniAcc, uniLoss) = accuracyAndLoss("unigram")
    val (biAcc, biLoss) = accuracyAndLoss("bigram")
    // unigram: both classes present identical feature vectors — chance
    assert(uniAcc <= 0.6, s"unigram should be at chance, measured $uniAcc")
    assert(biAcc >= 0.95, s"bigram should separate, measured $biAcc")
    assert(biLoss < uniLoss / 2,
      s"bigram loss must collapse vs unigram: $biLoss vs $uniLoss")
  }

  test("bigram extraction: sub-2-word docs yield no bigrams, x sums to 1") {
    val docs = Seq((1L, "solo"), (2L, "two words")).toDF("doc_id", "text")
    val labels = Seq((1L, 1L, 1), (2L, 2L, 0)).toDF("doc_id", "n_words", "y")
    val f = Classify.featuresOf(docs, labels, "bigram").collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    // doc 1: one unigram gram; doc 2: two unigrams + one bigram
    assert(f.count(_._1 == 1L) == 1)
    val x2 = f.filter(_._1 == 2L).map(_._2).sum
    assert(math.abs(f.filter(_._1 == 1L).map(_._2).sum - 1.0) < 1e-12)
    assert(math.abs(x2 - 1.0) < 1e-12, s"doc-2 mass $x2")
  }

  test("a typo'd feature mode fails loudly") {
    val (docs, labels) = fixture()
    intercept[IllegalArgumentException] {
      Classify.featuresOf(docs, labels, "trigram")
    }
  }
}
