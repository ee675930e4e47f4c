package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions._
import graft.functions.expr.VectorExpressions
import graft.operators.Dedup

/** The custom codegen expressions must be bit-identical to the
  * higher-order-function formulations they replace — the DuckDB
  * oracles were validated against the latter. */
class ExprSpec extends SparkSpec {

  test("DotProduct ≡ aggregate(zip_with) fold, bit for bit") {
    val e = Tables(spark, sf).embeddings.limit(100)
    val hof = aggregate(
      zip_with(col("embedding"), col("embedding"), (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val diff = e.select(
        VectorExpressions.dotProduct(col("embedding"), col("embedding")).as("a"),
        hof.as("b"))
      .filter(col("a") =!= col("b"))
    assert(diff.count() == 0)
  }

  test("SimHash32 ≡ simhashFromHashes, bit for bit") {
    val d = Tables(spark, sf).documents.limit(100)
      .select(col("doc_id"),
        transform(split(normText(col("text")), " "), w => md5_32(w)).as("hs"))
    val diff = d.select(
        VectorExpressions.simhash32(col("hs")).as("a"),
        Dedup.simhashFromHashes(col("hs")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(diff.count() == 0)
  }

  test("MinHashSigs ≡ per-permutation aggregate, bit for bit") {
    val d = Tables(spark, sf).documents.limit(100)
      .select(col("doc_id"),
        transform(shingles(col("text"), 3), s => md5_32(s)).as("hs"))
    val P = Dedup.P
    val hof = transform(sequence(lit(0), lit(Dedup.NumPerms - 1)), i =>
      aggregate(col("hs"), lit(P),
        (acc, h) => least(acc, ((lit(2L) * i + 1L) * h + (lit(1000003L) * (i + 1)) % P) % P)))
    val diff = d.select(
        VectorExpressions.minhashSigs(col("hs"), Dedup.NumPerms, P).as("a"),
        hof.as("b"))
      .filter(col("a") =!= col("b"))
    assert(diff.count() == 0)
  }

  test("WordChunks ≡ per-chunk slice/join on a materialized word array") {
    val n = Dedup.ChunkWords
    // Reference formulation over a MATERIALIZED array column (safe for
    // a spec; in the operator this shape would re-evaluate the split
    // per chunk after projection collapse — why WordChunks exists).
    val d = Tables(spark, sf).documents.limit(200)
      .select(col("doc_id"), words(col("text")).as("w"))
      .localCheckpoint()
    val ref = expr(
      s"transform(sequence(1, size(w) div $n), c -> array_join(slice(w, (c - 1) * $n + 1, $n), ' '))")
    val diff = d.select(
        VectorExpressions.wordChunks(col("w"), n).as("a"),
        when(size(col("w")) >= n, ref)
          .otherwise(array().cast("array<string>")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(diff.count() == 0)
    // order and duplicates preserved: chunk count is exactly ⌊m/n⌋
    val badLen = d.select(size(VectorExpressions.wordChunks(col("w"), n)).as("k"),
        expr(s"size(w) div $n").as("e"))
      .filter(col("k") =!= col("e"))
    assert(badLen.count() == 0)
  }

  test("NormText ≡ the lower/regex/trim chain on ASCII, Unicode, and edge strings") {
    // the chain normText used to build inline — the reference
    def chain(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))
    val rng = new scala.util.Random(7)
    val ascii = (1 to 300).map { _ =>
      (1 to rng.nextInt(80)).map(_ => rng.nextPrintableChar()).mkString
    }
    val edge = Seq("", " ", "   ", "a", "A", "  a  b  ", "a!b@c#1$2%3",
      "ALL CAPS", "tabs\tand\nnewlines", "mixedÜnicodé", "ünicode only",
      "Kelvin K sign", "emoji 😀 mid", "trailing space ",
      " leading", "1234567890", "!@#$%^&*()")
    val uni = (1 to 100).map { _ =>
      (1 to rng.nextInt(30)).map(_ => (rng.nextInt(0xCFFF) + 1).toChar).mkString
    }
    val rows = (ascii ++ edge ++ uni).map(s => org.apache.spark.sql.Row(s))
    val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType))))
      .localCheckpoint()
    val diff = df.select(normText(col("text")).as("a"), chain(col("text")).as("b"))
      .filter(!(col("a") <=> col("b")))
    assert(diff.count() == 0)
  }

  test("RoundHalfUp ≡ the when/isnan/floor chain, bit for bit incl. non-finite") {
    import graft.functions.Parity
    // the chain stableRound used to build inline — kept here as the
    // reference the expression is pinned against
    def chain(c: org.apache.spark.sql.Column, s: Int): org.apache.spark.sql.Column = {
      val p = math.pow(10, s)
      when(isnan(c) || abs(c) === lit(Double.PositiveInfinity), c)
        .otherwise(floor(c * lit(p) + lit(0.5)) / lit(p))
    }
    val vals = Seq(0.0, -0.0, 1.0 / 3, -1.0 / 3, 0.005, -0.005, 0.015,
      52724.244999999995, -52724.244999999995, 1e15, -1e15, 1e18, -1e18,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      Double.MinPositiveValue, 4.9e-300, 123456.789012345) ++
      (1 to 400).map(i => math.sin(i.toDouble) * math.pow(10, i % 12))
    val df = spark.createDataFrame(
        spark.sparkContext.parallelize(vals.map(org.apache.spark.sql.Row(_)), 2),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.DoubleType))))
      .localCheckpoint()
    for (s <- Seq(0, 2, 4, 6, 15)) {
      val diff = df.select(Parity.stableRound(col("v"), s).as("a"),
          chain(col("v"), s).as("b"))
        // NaN = NaN must count as equal: compare raw bits
        .filter(expr("""
          CASE WHEN isnan(a) AND isnan(b) THEN false ELSE a <=> b = false END"""))
      assert(diff.count() == 0, s"scale $s diverged")
    }
  }
}
