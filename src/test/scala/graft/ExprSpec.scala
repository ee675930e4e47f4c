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
}
