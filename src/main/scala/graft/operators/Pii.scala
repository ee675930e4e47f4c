package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** PII detection / redaction over the `documents` table — the
  * personally-identifiable-information pass every public training
  * pipeline runs before release (emails, phone numbers, IP addresses
  * masked with typed placeholders; cf. the denylist plumbing of
  * [[Curation.tScrub]], which this extends with class-typed patterns
  * and per-class counts).
  *
  * The synthetic corpus contains no PII, so — exactly like
  * [[WebCuration.withUrl]]'s pseudo-URL — deterministic PII spans are
  * DERIVED from md5(doc_id ∥ "pii") and appended to the text in
  * [[withPii]]: both engines compute the identical digest of the
  * identical string, so the injected spans (and therefore every count
  * and redaction) reproduce bit-for-bit in the DuckDB oracle. Digits
  * come from `translate(hex, 'abcdef', '012345')` — a pure
  * character-map both engines implement identically; no hex→int
  * conversion (spelling differs across engines). On a real crawl the
  * shim drops out and the detection pass runs on the raw text
  * unchanged.
  *
  * Scale shape: a single narrow map over the scan — inject, three
  * `regexp_count`s, one three-step `regexp_replace` chain — followed
  * only by the presentation orderBy. No shuffle, no UDF; the regex
  * subset (character classes, bounded repetition, ASCII `\b`) is one
  * Java regex and RE2 agree on.
  */
object Pii {

  /** Class-typed patterns. Lowercase-only classes: the injected spans
    * are lowercase and normText-style corpora are too; a real crawl
    * would widen the classes, not change the shape. */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhonePattern = "\\b555-[0-9]{3}-[0-9]{4}\\b"
  val IpPattern = "\\b10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Deterministic PII injection: ~50% of docs gain an email, 25% a
    * 555-prefixed phone, 25% an IPv4 in 10/8 (phone and IP disjoint —
    * both keyed on the same hex digit). */
  def withPii(docs: DataFrame): DataFrame =
    docs.withColumn("text", injectedText(col("doc_id"), col("text")))

  /** The injection as a COLUMN over (doc_id, text) — the ONE copy,
    * exposed so [[Curation]]'s one-pass audit rule frame can evaluate
    * the pii flag in the same projection as the other rules. */
  private[operators] def injectedText(docId: Column, text: Column): Column = {
    val h = md5(concat(docId.cast("string"), lit("pii")))
    def hexIn(pos: Int, chars: String): Column =
      substring(h, pos, 1).isInCollection(chars.map(_.toString))
    def digits(pos: Int, len: Int): Column =
      translate(substring(h, pos, len), "abcdef", "012345")
    val email = when(hexIn(1, "01234567"),
      concat(lit(" contact user"), digits(3, 4), lit("@mail"), digits(7, 2),
        lit(".com"))).otherwise("")
    val phone = when(hexIn(2, "0123"),
      concat(lit(" call 555-"), digits(9, 3), lit("-"), digits(12, 4)))
      .otherwise("")
    val ip = when(hexIn(2, "89ab"),
      concat(lit(" from 10."), digits(16, 2), lit("."), digits(18, 2),
        lit("."), digits(20, 2))).otherwise("")
    concat(text, email, phone, ip)
  }

  /** `has_pii` over an (already injected) text column — the exact
    * predicate [[tPii]] reports, WITHOUT the redaction replace chain
    * (the audit only needs the flag; the three regexp_replace passes
    * are the scrub operator's cost, not the flag's). */
  private[operators] def hasPiiCol(text: Column): Column =
    (regexp_count(text, lit(EmailPattern)) +
      regexp_count(text, lit(PhonePattern)) +
      regexp_count(text, lit(IpPattern))) > 0

  /** The same injection as an oracle CTE body over `documents`
    * (rewrites the `text` column). Interpolated into stripMargin
    * templates, so no line starts with `|` (the `||` sit at line
    * end). */
  val withPiiSql: String =
    """SELECT doc_id, lang, source, n_chars, text ||
      |  (CASE WHEN substr(h, 1, 1) IN ('0','1','2','3','4','5','6','7')
      |        THEN ' contact user' || translate(substr(h, 3, 4), 'abcdef', '012345') ||
      |             '@mail' || translate(substr(h, 7, 2), 'abcdef', '012345') || '.com'
      |        ELSE '' END) ||
      |  (CASE WHEN substr(h, 2, 1) IN ('0','1','2','3')
      |        THEN ' call 555-' || translate(substr(h, 9, 3), 'abcdef', '012345') ||
      |             '-' || translate(substr(h, 12, 4), 'abcdef', '012345')
      |        ELSE '' END) ||
      |  (CASE WHEN substr(h, 2, 1) IN ('8','9','a','b')
      |        THEN ' from 10.' || translate(substr(h, 16, 2), 'abcdef', '012345') ||
      |             '.' || translate(substr(h, 18, 2), 'abcdef', '012345') ||
      |             '.' || translate(substr(h, 20, 2), 'abcdef', '012345')
      |        ELSE '' END) AS text
      |FROM (SELECT *, md5(doc_id::VARCHAR || 'pii') AS h FROM documents) d""".stripMargin

  /** t_pii — per-document typed PII counts plus the redacted text:
    * emails → `[EMAIL]`, phones → `[PHONE]`, IPs → `[IP]`. The
    * replace chain runs email-first so the later patterns never see a
    * span the earlier class already consumed (the three patterns are
    * mutually exclusive here anyway). */
  def tPii(spark: SparkSession, dir: String): DataFrame = {
    val d = withPii(Tables.spread(Tables(spark, dir).documents))
    val scrubbed = regexp_replace(
      regexp_replace(
        regexp_replace(col("text"), EmailPattern, "[EMAIL]"),
        PhonePattern, "[PHONE]"),
      IpPattern, "[IP]")
    d.select(
        col("doc_id"),
        regexp_count(col("text"), lit(EmailPattern)).cast("long").as("n_email"),
        regexp_count(col("text"), lit(PhonePattern)).cast("long").as("n_phone"),
        regexp_count(col("text"), lit(IpPattern)).cast("long").as("n_ip"),
        scrubbed.as("scrubbed"))
      .withColumn("has_pii",
        col("n_email") + col("n_phone") + col("n_ip") > 0)
      .orderBy("doc_id")
  }

  val tPiiSql: String =
    s"""WITH p AS ($withPiiSql)
       |SELECT doc_id,
       |  len(regexp_extract_all(text, '$EmailPattern'))::BIGINT AS n_email,
       |  len(regexp_extract_all(text, '$PhonePattern'))::BIGINT AS n_phone,
       |  len(regexp_extract_all(text, '$IpPattern'))::BIGINT AS n_ip,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '$EmailPattern', '[EMAIL]', 'g'),
       |    '$PhonePattern', '[PHONE]', 'g'),
       |    '$IpPattern', '[IP]', 'g') AS scrubbed,
       |  (len(regexp_extract_all(text, '$EmailPattern')) +
       |   len(regexp_extract_all(text, '$PhonePattern')) +
       |   len(regexp_extract_all(text, '$IpPattern'))) > 0 AS has_pii
       |FROM p
       |ORDER BY doc_id""".stripMargin

  /** k-anonymity threshold: a quasi-identifier class smaller than
    * this is re-identifiable. */
  val KAnon = 5

  /** Account-balance band width for the generalized quasi-identifier
    * (generalization is the standard k-anonymity remediation — raw
    * balances would make nearly every class a singleton). */
  val BalBand = 1000.0

  /** d_kanon — k-anonymity audit over the customer table (the
    * governance gate before person-linked attributes feed a training
    * mixture): each record's quasi-identifier class (nation, market
    * segment, generalized balance band) is sized, and records in
    * classes below [[KAnon]] are flagged for suppression or further
    * generalization. One hash shuffle on the class key; class
    * cardinality grows with the data, so the aggregation distributes
    * — and the per-record flag joins the class size back broadcastish
    * (class table ≪ records). Integer-only decisions (band via
    * floor-division, identical IEEE both engines). */
  def dKanon(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir).customer
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / BalBand).cast("long").as("bal_band"))
    val classes = c.groupBy("c_nationkey", "c_mktsegment", "bal_band")
      .agg(count(lit(1)).as("class_size"))
    c.join(classes, Seq("c_nationkey", "c_mktsegment", "bal_band"))
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"), col("bal_band"),
        col("class_size"), (col("class_size") < KAnon).as("reidentifiable"))
      .orderBy("c_custkey")
  }

  val dKanonSql: String =
    s"""WITH q AS (
       |  SELECT c_custkey, c_nationkey, c_mktsegment,
       |    floor(c_acctbal / $BalBand)::BIGINT AS bal_band
       |  FROM customer),
       |cls AS (
       |  SELECT c_nationkey, c_mktsegment, bal_band,
       |    count(*)::BIGINT AS class_size
       |  FROM q GROUP BY 1, 2, 3)
       |SELECT q.c_custkey, q.c_nationkey::BIGINT AS nation,
       |  q.c_mktsegment AS segment, q.bal_band, cls.class_size,
       |  (cls.class_size < $KAnon) AS reidentifiable
       |FROM q JOIN cls USING (c_nationkey, c_mktsegment, bal_band)
       |ORDER BY c_custkey""".stripMargin

  /** l-diversity threshold: a class whose members span fewer than
    * this many sensitive values is open to the homogeneity attack. */
  val LDiv = 3

  /** d_ldiv — l-DIVERSITY audit, the attribute-disclosure complement
    * of [[dKanon]] (Machanavajjhala et al. 2007): k-anonymity bounds
    * RE-IDENTIFICATION by class size, but a class of 50 records that
    * all share one sensitive value still discloses that value to
    * anyone who can place a person in the class (the homogeneity
    * attack). Per quasi-identifier class (nation, balance band):
    * size, the number of DISTINCT sensitive values (market segment
    * here), the dominant value's share, and the two flags a privacy
    * gate reads — `l_diverse` (≥ [[LDiv]] distinct values) and
    * `homogeneous` (one value — the worst case). Suppress or
    * generalize the failing classes before person-linked attributes
    * feed a mixture, exactly as with d_kanon's small classes.
    *
    * Scale shape: one (class, value)-keyed count, then a class-keyed
    * roll-up — both map-side combined, both bounded by class-table
    * cardinality ≪ records; no joins. Parity: integers plus one
    * rounded share division. */
  def dLdiv(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Parity.stableRound
    val q = Tables(spark, dir).customer
      .select(col("c_nationkey").cast("long").as("nation"),
        floor(col("c_acctbal") / BalBand).cast("long").as("bal_band"),
        col("c_mktsegment").as("segment"))
    q.groupBy("nation", "bal_band", "segment")
      .agg(count(lit(1)).as("vc"))
      .groupBy("nation", "bal_band")
      .agg(sum(col("vc")).as("class_size"),
        count(lit(1)).as("n_sensitive"),
        max(col("vc")).as("top_count"))
      .select(col("nation"), col("bal_band"),
        col("class_size").cast("long").as("class_size"),
        col("n_sensitive").cast("long").as("n_sensitive"),
        stableRound(col("top_count").cast("double") /
          col("class_size").cast("double"), 4).as("top_share"),
        (col("n_sensitive") >= LDiv).as("l_diverse"),
        (col("n_sensitive") === 1).as("homogeneous"))
      .orderBy("nation", "bal_band")
  }

  val dLdivSql: String = {
    import graft.functions.Parity.stableRoundSql
    s"""WITH q AS (
       |  SELECT c_nationkey::BIGINT AS nation,
       |    floor(c_acctbal / $BalBand)::BIGINT AS bal_band,
       |    c_mktsegment AS segment
       |  FROM customer),
       |vc AS (
       |  SELECT nation, bal_band, segment, count(*)::BIGINT AS vc
       |  FROM q GROUP BY 1, 2, 3)
       |SELECT nation, bal_band,
       |  sum(vc)::BIGINT AS class_size,
       |  count(*)::BIGINT AS n_sensitive,
       |  ${stableRoundSql(
            "max(vc)::DOUBLE / sum(vc)::DOUBLE", 4)} AS top_share,
       |  count(*) >= $LDiv AS l_diverse,
       |  count(*) = 1 AS homogeneous
       |FROM vc
       |GROUP BY nation, bal_band
       |ORDER BY nation, bal_band""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_pii" -> tPii,
    "d_kanon" -> dKanon,
    "d_ldiv" -> dLdiv,
  )

  def oracles: Map[String, String] = Map(
    "t_pii" -> tPiiSql,
    "d_kanon" -> dKanonSql,
    "d_ldiv" -> dLdivSql,
  )
}
