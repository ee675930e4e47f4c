package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions._

/** Deduplication operators over the `documents` table.
  *
  * Scale discipline (SURVEY.md §5): no variant ever cross-joins the
  * corpus. Candidate generation is always linear-ish — a groupBy on a
  * fingerprint (exact), an inverted shingle index (n-gram Jaccard), or
  * LSH band buckets (MinHash / SimHash) — followed by pair
  * verification only inside buckets. All hashes are md5-derived so the
  * DuckDB oracles replay them exactly.
  */
object Dedup {

  /** Mersenne prime modulus for the MinHash permutation family. */
  val P = 2147483647L
  val NumPerms = 16
  val Bands = 4
  val RowsPerBand = 4
  /** Verified-Jaccard threshold for near-dup pairs. */
  val JaccardTau = 0.3
  /** SimHash hamming-distance threshold (32-bit hash, 4 bands of 8
    * bits: pigeonhole guarantees any pair at distance ≤ 3 shares a
    * band). */
  val HammingK = 3

  private val normSql =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  // ---------------------------------------------------------------- exact

  /** Exact dedup: group by md5 of normalized content, keep the min
    * doc_id of each group. Output is the full keeper mapping (one row
    * per doc) — `is_dup` marks rows that would be dropped. A single
    * hash-shuffle; at 100 TB this is the cheapest possible dedup. */
  def dDedupExact(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val fp = d.select(col("doc_id"), md5(normText(col("text"))).as("content_fp"))
    val keepers = fp.groupBy(col("content_fp"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("group_size"))
    fp.join(keepers, "content_fp")
      .select(col("doc_id"), col("content_fp"), col("keeper_id"),
        col("group_size"), (col("doc_id") =!= col("keeper_id")).as("is_dup"))
      .orderBy("doc_id")
  }

  val dDedupExactSql: String =
    s"""SELECT doc_id, content_fp,
       |  min(doc_id) OVER (PARTITION BY content_fp) AS keeper_id,
       |  count(*) OVER (PARTITION BY content_fp) AS group_size,
       |  doc_id <> min(doc_id) OVER (PARTITION BY content_fp) AS is_dup
       |FROM (SELECT doc_id, md5($normSql) AS content_fp FROM documents) t
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------- n-gram Jaccard

  /** Distinct word-3-gram shingles per doc (docs with <3 words drop
    * out — they cannot form a shingle). */
  private def shingleSets(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    d.select(col("doc_id"), shingles(col("text"), 3).as("shing"))
      .filter(size(col("shing")) > 0)
  }

  private val shingleSetsSql: String =
    s"""SELECT doc_id,
       |  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) AS shing
       |FROM (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents) t
       |WHERE len(w) >= 3""".stripMargin

  /** n-gram Jaccard near-dup pairs via an inverted shingle index:
    * explode (doc, shingle), self-join on shingle (bounded by posting
    * lists, never all-pairs), count shared shingles per pair, then
    * Jaccard = |∩| / (|A|+|B|-|∩|) ≥ τ. Integer-exact arithmetic. */
  def dDedupNgram(spark: SparkSession, dir: String): DataFrame = {
    val sets = shingleSets(spark, dir)
    val sizes = sets.select(col("doc_id"), size(col("shing")).as("n"))
    val posts = sets.select(col("doc_id"), explode(col("shing")).as("shingle"))
    val pairs = posts.as("a").join(posts.as("b"), "shingle")
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.select(col("doc_id").as("id1"), col("n").as("n1")), "id1")
      .join(sizes.select(col("doc_id").as("id2"), col("n").as("n2")), "id2")
      .withColumn("jaccard", round(col("inter") / (col("n1") + col("n2") - col("inter")), 6))
      .filter(col("jaccard") >= JaccardTau)
      .select("id1", "id2", "inter", "jaccard")
      .orderBy("id1", "id2")
  }

  val dDedupNgramSql: String =
    s"""WITH sets AS ($shingleSetsSql),
       |posts AS (SELECT doc_id, unnest(shing) AS shingle FROM sets),
       |pairs AS (
       |  SELECT a.doc_id id1, b.doc_id id2, count(*) AS inter
       |  FROM posts a JOIN posts b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id1, id2, inter,
       |  round(inter / (s1.n + s2.n - inter)::DOUBLE, 6) AS jaccard
       |FROM pairs
       |JOIN (SELECT doc_id, len(shing) n FROM sets) s1 ON id1 = s1.doc_id
       |JOIN (SELECT doc_id, len(shing) n FROM sets) s2 ON id2 = s2.doc_id
       |WHERE round(inter / (s1.n + s2.n - inter)::DOUBLE, 6) >= $JaccardTau
       |ORDER BY id1, id2""".stripMargin

  // ------------------------------------------------------- MinHash LSH

  /** MinHash signatures: shingle → 32-bit md5 hash h, permutation i
    * gives ((2i+1)·h + b_i) mod P, signature = min over shingles.
    * 16 perms, banded 4×4 for LSH. */
  private def minhashSigs(spark: SparkSession, dir: String): DataFrame = {
    val sets = shingleSets(spark, dir)
    val hs = transform(col("shing"), s => md5_32(s))
    val sigs = transform(sequence(lit(0), lit(NumPerms - 1)), i =>
      aggregate(hs, lit(P),
        (acc, h) => least(acc, ((lit(2L) * i + 1L) * h + (lit(1000003L) * (i + 1)) % P) % P)))
    sets.select(col("doc_id"), col("shing"), sigs.as("sig"))
  }

  private val minhashSigsSql: String =
    s"""sigs AS (
       |  SELECT doc_id, i,
       |    min(((2*i + 1)*h + (1000003*(i + 1)) % $P) % $P) AS sig
       |  FROM (SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h
       |        FROM (SELECT doc_id, unnest(shing) AS s FROM sets) e)
       |  CROSS JOIN (SELECT unnest(range($NumPerms)) AS i) p
       |  GROUP BY doc_id, i),
       |sigarr AS (SELECT doc_id, list(sig ORDER BY i) AS sig FROM sigs GROUP BY doc_id)""".stripMargin

  /** MinHash+LSH near-dup pairs: band key = md5 of 4 consecutive sig
    * values; candidates collide on (band, key); candidates are then
    * verified with exact Jaccard ≥ τ. Only bucket-mates are ever
    * paired — candidate generation is one explode + one shuffle. */
  def dDedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val sigs = minhashSigs(spark, dir)
    val bands = sigs.select(col("doc_id"), col("shing"),
        explode(transform(sequence(lit(0), lit(Bands - 1)), b =>
          struct(b.as("band"),
            md5(concat_ws("-",
              transform(slice(col("sig"), b * RowsPerBand + 1, lit(RowsPerBand)),
                x => x.cast("string")))).as("key")))).as("bk"))
      .select(col("doc_id"), col("shing"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = bands.as("a").join(bands.as("b"), Seq("band", "key"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.shing").as("s1"), col("b.shing").as("s2"))
      .dropDuplicates("id1", "id2")
    cand
      .withColumn("inter", size(array_intersect(col("s1"), col("s2"))))
      .withColumn("un", size(col("s1")) + size(col("s2")) - col("inter"))
      .withColumn("jaccard", round(col("inter") / col("un"), 6))
      .filter(col("jaccard") >= JaccardTau)
      .select("id1", "id2", "jaccard")
      .orderBy("id1", "id2")
  }

  val dDedupMinhashSql: String =
    s"""WITH sets AS ($shingleSetsSql),
       |$minhashSigsSql,
       |bands AS (
       |  SELECT doc_id, b,
       |    md5(array_to_string(list_transform(sig[b*$RowsPerBand + 1 : b*$RowsPerBand + $RowsPerBand],
       |      x -> x::VARCHAR), '-')) AS key
       |  FROM sigarr CROSS JOIN (SELECT unnest(range($Bands)) AS b) bb),
       |cand AS (
       |  SELECT DISTINCT a.doc_id id1, b.doc_id id2
       |  FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id)
       |SELECT id1, id2,
       |  round(len(list_intersect(sa.shing, sb.shing)) /
       |    (len(sa.shing) + len(sb.shing) - len(list_intersect(sa.shing, sb.shing)))::DOUBLE, 6) AS jaccard
       |FROM cand JOIN sets sa ON id1 = sa.doc_id JOIN sets sb ON id2 = sb.doc_id
       |WHERE round(len(list_intersect(sa.shing, sb.shing)) /
       |    (len(sa.shing) + len(sb.shing) - len(list_intersect(sa.shing, sb.shing)))::DOUBLE, 6) >= $JaccardTau
       |ORDER BY id1, id2""".stripMargin

  // ---------------------------------------------------------- SimHash

  /** Frequency-weighted 32-bit SimHash over normalized words: bit j is
    * set when Σ_words (±1 by bit j of the word hash) is positive. */
  def simhash(text: Column): Column = {
    val hs = transform(split(normText(text), " "), w => md5_32(w))
    (0 until 32).map { j =>
      when(aggregate(hs, lit(0L),
        (acc, h) => acc + (shiftright(h, j) % 2L) * 2L - 1L) > 0, lit(1L << j))
        .otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** SimHash near-dup pairs: 4 bands of 8 bits generate candidates
    * (pigeonhole-complete for hamming ≤ 3), verified with exact
    * bit_count(xor) ≤ k. */
  def dDedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val sims = d.select(col("doc_id"), simhash(col("text")).as("s"))
    // shiftright needs a literal bit count, so bands are a small union
    val banded = (0 until 4).map { b =>
      sims.select(col("doc_id"), col("s"), lit(b).as("band"),
        (shiftright(col("s"), 8 * b).bitwiseAND(lit(255L))).as("bv"))
    }.reduce(_ unionByName _)
    val cand = banded.as("a").join(banded.as("b"), Seq("band", "bv"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.s").as("s1"), col("b.s").as("s2"))
      .dropDuplicates("id1", "id2")
    cand.withColumn("hamming", bit_count(col("s1").bitwiseXOR(col("s2"))).cast("long"))
      .filter(col("hamming") <= HammingK)
      .select("id1", "id2", "hamming")
      .orderBy("id1", "id2")
  }

  val dDedupSimhashSql: String =
    s"""WITH docs AS (SELECT doc_id, $normSql AS norm FROM documents),
       |wh AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 8))::BIGINT AS h
       |       FROM (SELECT doc_id, unnest(string_split(norm, ' ')) AS w FROM docs) e),
       |bits AS (
       |  SELECT doc_id, j,
       |    CASE WHEN sum(((h >> j) & 1)*2 - 1) > 0 THEN (1::BIGINT << j) ELSE 0 END AS bitv
       |  FROM wh CROSS JOIN (SELECT unnest(range(32)) AS j) jj GROUP BY doc_id, j),
       |sim AS (SELECT doc_id, sum(bitv)::BIGINT AS s FROM bits GROUP BY doc_id),
       |bands AS (SELECT doc_id, s, b, (s >> (8*b)) & 255 AS bv
       |          FROM sim CROSS JOIN (SELECT unnest(range(4)) AS b) bb),
       |cand AS (
       |  SELECT DISTINCT a.doc_id id1, b.doc_id id2, a.s s1, b.s s2
       |  FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id)
       |SELECT id1, id2, bit_count(xor(s1, s2))::BIGINT AS hamming
       |FROM cand
       |WHERE bit_count(xor(s1, s2)) <= $HammingK
       |ORDER BY id1, id2""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d_dedup_exact" -> dDedupExact,
    "d_dedup_ngram" -> dDedupNgram,
    "d_dedup_minhash" -> dDedupMinhash,
    "d_dedup_simhash" -> dDedupSimhash,
  )

  def oracles: Map[String, String] = Map(
    "d_dedup_exact" -> dDedupExactSql,
    "d_dedup_ngram" -> dDedupNgramSql,
    "d_dedup_minhash" -> dDedupMinhashSql,
    "d_dedup_simhash" -> dDedupSimhashSql,
  )
}
