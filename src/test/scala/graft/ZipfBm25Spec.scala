package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.words
import graft.operators.Retrieval

/** Measured artifact for the t_bm25 scale claim (SURVEY §8): the
  * candidate stream is bounded by Σ df over the seeds' keyword terms,
  * and on a NATURAL (Zipfian) vocabulary the top-TF-IDF keywords are
  * rare, so that bound is a sliver of corpus×queries — whereas the
  * driver's 31-word uniform vocabulary forces df ≈ 0.78·corpus on
  * every term (the measured cause of the 7.5 s bench line). This
  * fixture quantifies the collapse on comparable corpus sizes.
  */
class ZipfBm25Spec extends SparkSpec {

  /** (docs, seeds, Σ df over the seeds' top-8 TF-IDF terms) — the
    * exact candidate-stream volume of the t_bm25 postings join: the
    * same tf construction as tBm25 and the operator's OWN keyword
    * ranking ([[graft.operators.TextAnalysis.tfIdfRank]] — stableRound
    * score, word tie-break), so the measured Σdf is the operator's by
    * construction, not a re-implementation that could drift on ties. */
  private def candidateStats(dir: String): (Long, Long, Long) = {
    val d = graft.core.Tables(spark, dir).documents
    val n = d.count()
    val tf = d.select(col("doc_id"), explode(words(col("text"))).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val dfw = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val qt = graft.operators.TextAnalysis.tfIdfRank(
        tf.filter(col("doc_id") % Retrieval.Bm25QueryMod === 0), dfw, n.toDouble)
      .filter(col("rk") <= Retrieval.Bm25QTerms)
    val seeds = qt.select("doc_id").distinct().count()
    val cands = qt.agg(sum(col("df"))).head().getLong(0)
    (n, seeds, cands)
  }

  test("zipfian keywords collapse the bm25 candidate stream; uniform vocab maxes it") {
    // Zipf corpus: the ZipfNgramSpec generator parameters, no dup block
    val rnd = new scala.util.Random(20260814L)
    val nDocs = 750
    val vocab = 3750
    val zexp = 1.07
    val cum = Array.tabulate(vocab)(r => 1.0 / math.pow(r + 1.0, zexp))
      .scanLeft(0.0)(_ + _).tail
    def draw(): String = {
      val x = rnd.nextDouble() * cum.last
      var lo = 0
      var hi = vocab - 1
      while (lo < hi) {
        val mid = (lo + hi) / 2
        if (cum(mid) < x) lo = mid + 1 else hi = mid
      }
      s"w$lo"
    }
    val s = spark
    import s.implicits._
    val dirPath = java.nio.file.Files.createTempDirectory("graft_zipf_bm25_")
    val dir = dirPath.toString
    try {
      (0 until nDocs).map { i =>
        (i.toLong, Seq.fill(40 + rnd.nextInt(61))(draw()).mkString(" "))
      }.toDF("doc_id", "text")
        .withColumn("lang", lit("en"))
        .withColumn("source", lit("zipf"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val (nu, su, cu) = candidateStats(sf)   // driver corpus: uniform 31-word vocab
      val (nz, sz, cz) = candidateStats(dir)  // zipfian fixture, comparable size
      val fracUniform = cu.toDouble / (su.toDouble * nu)
      val fracZipf = cz.toDouble / (sz.toDouble * nz)
      info(f"uniform: $nu docs, $su seeds, $cu candidates (${fracUniform * 100}%.1f%% of corpus x queries)")
      info(f"zipf:    $nz docs, $sz seeds, $cz candidates (${fracZipf * 100}%.1f%% of corpus x queries)")
      // the claim: natural-vocabulary keywords are rare, so the Σdf
      // bound collapses by well over an order of magnitude
      assert(fracZipf < fracUniform / 10.0,
        f"zipf fraction $fracZipf%.4f not <10%% of uniform $fracUniform%.4f")
      // and bm25 itself runs green end-to-end on the zipfian corpus
      assert(Retrieval.tBm25(spark, dir).count() > 0)

      // exactness: MaxScore must reproduce bm25's top-k on the
      // rare-keyword corpus too (its θ often never forms there —
      // the keep-all fallback must kick in, not a wrong prune)
      assert(Retrieval.tBm25MaxScore(spark, dir).collect().toSeq ==
        Retrieval.tBm25(spark, dir).collect().toSeq,
        "maxscore diverged from exact bm25 on the zipf corpus")
    } finally {
      // don't leak a parquet corpus per run
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq.reverse
        .foreach(p => { java.nio.file.Files.deleteIfExists(p): Unit })
    }
  }

  test("maxscore prunes the exact phase on a mixed-vocabulary corpus, result-identical") {
    // The regime WAND/MaxScore exists for: common terms inflate the
    // candidate set, rare terms skew the score distribution, so the
    // seed-phase threshold separates. (The rare-keyword zipf fixture
    // above is the opposite regime — its Σdf bound already collapses
    // the stream and there is nothing left to prune; measured 100%
    // survivors there, which is why this fixture exists.) Longer docs
    // + a moderate vocabulary put mid-df terms into the seeds' top-8
    // TF-IDF keywords.
    val rnd = new scala.util.Random(20260815L)
    val nDocs = 1000
    val vocab = 500
    val zexp = 1.05
    val cum = Array.tabulate(vocab)(r => 1.0 / math.pow(r + 1.0, zexp))
      .scanLeft(0.0)(_ + _).tail
    def draw(): String = {
      val x = rnd.nextDouble() * cum.last
      var lo = 0
      var hi = vocab - 1
      while (lo < hi) {
        val mid = (lo + hi) / 2
        if (cum(mid) < x) lo = mid + 1 else hi = mid
      }
      s"w$lo"
    }
    val s = spark
    import s.implicits._
    val dirPath = java.nio.file.Files.createTempDirectory("graft_mixed_bm25_")
    val dir = dirPath.toString
    try {
      (0 until nDocs).map { i =>
        (i.toLong, Seq.fill(150 + rnd.nextInt(151))(draw()).mkString(" "))
      }.toDF("doc_id", "text")
        .withColumn("lang", lit("en"))
        .withColumn("source", lit("mixed"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      assert(Retrieval.tBm25MaxScore(spark, dir).collect().toSeq ==
        Retrieval.tBm25(spark, dir).collect().toSeq,
        "maxscore diverged from exact bm25 on the mixed corpus")
      def pruneStats(d: String): (Long, Long) = {
        val p = Retrieval.bm25Parts(spark, d)
        val agg = Retrieval.maxScoreAgg(spark, p)
        val full = agg.count()
        val surv = agg.filter(Retrieval.maxScoreKeep).count()
        (full, surv)
      }
      val (fu, su) = pruneStats(sf)
      val (fm, sm) = pruneStats(dir)
      info(f"maxscore survivors — uniform driver corpus: $su/$fu " +
        f"(${su * 100.0 / fu}%.1f%%), mixed zipf: $sm/$fm (${sm * 100.0 / fm}%.1f%%)")
      // the measured claim: the exact phase shrinks to a fraction of
      // the candidate (qid, doc) space on a natural mixed vocabulary
      assert(sm < fm / 2,
        s"maxscore pruned only ${fm - sm} of $fm candidate docs")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq.reverse
        .foreach(p => { java.nio.file.Files.deleteIfExists(p): Unit })
    }
  }
}
