package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Parity.{stableRound, stableRoundSql}

/** URL / domain curation over the `documents` table — the per-domain
  * bookkeeping a web-scale training pipeline runs: parse URLs into
  * components, then budget documents per registered domain so no
  * single site dominates the mixture.
  *
  * The synthetic `documents` table carries no URL column, so one is
  * DERIVED deterministically from (doc_id, source) via md5 — both
  * engines compute the identical hex digest of the identical decimal
  * string, so every branch below reproduces bit-for-bit in the DuckDB
  * oracle. The derivation is a data shim, clearly separated in
  * [[withUrl]]; on a real crawl the column comes from the source and
  * everything downstream is unchanged.
  *
  * Scale shape: both operators are one narrow map over the scan plus
  * (for the budget) ONE hash shuffle on the registered domain. Domain
  * cardinality grows with the corpus (millions of sites at 100 TB), so
  * the per-domain window distributes evenly — unlike the per-language
  * budget ([[Curation.dBudget]]) whose handful of keys forced the
  * keyed-prefix-sum design. A pathological mega-domain is exactly the
  * skew AQE's skew-join/partition splitting handles; the rank cap
  * also bounds what any domain can emit.
  */
object WebCuration {

  /** Per-domain document budget: keep at most this many docs. */
  val DomainCap = 3

  /** Deterministic pseudo-URL: scheme fixed https, optional www
    * subdomain, registered domain from (source, hash-picked TLD), a
    * 1-3 segment path carrying hash hex, an optional ?ref= query.
    * Hex-char CASE branches (never numeric conversion — hex→int
    * differs in spelling across engines; IN-lists of chars do not). */
  def withUrl(docs: DataFrame): DataFrame = {
    val h = md5(col("doc_id").cast("string"))
    def hexIn(pos: Int, chars: String): Column =
      substring(h, pos, 1).isInCollection(chars.map(_.toString))
    val tld = when(hexIn(1, "0123"), "com")
      .when(hexIn(1, "4567"), "org")
      .when(hexIn(1, "89ab"), "net")
      .otherwise("io")
    val domain = concat(col("source"), lit("."), tld)
    val host = concat(when(hexIn(2, "01234567"), "www.").otherwise(""), domain)
    val seg1 = substring(h, 3, 4)
    val seg2 = substring(h, 7, 4)
    val seg3 = substring(h, 11, 4)
    val path = when(hexIn(15, "012345"), concat(lit("/"), seg1))
      .when(hexIn(15, "6789a"), concat(lit("/"), seg1, lit("/"), seg2))
      .otherwise(concat(lit("/"), seg1, lit("/"), seg2, lit("/"), seg3))
    val query = when(hexIn(16, "01234567"),
      concat(lit("?ref="), substring(h, 17, 2))).otherwise("")
    docs.withColumn("url", concat(lit("https://"), host, path, query))
  }

  /** The same derivation as [[withUrl]], as an oracle CTE body over
    * `documents` (adds the `url` column). Formatting constraint: this
    * string is INTERPOLATED into templates that apply stripMargin, so
    * no line may start with `|` (the `||` operators sit at line end). */
  val withUrlSql: String =
    """SELECT d.*, 'https://' ||
      |  (CASE WHEN substr(h, 2, 1) IN ('0','1','2','3','4','5','6','7')
      |        THEN 'www.' ELSE '' END) ||
      |  source || '.' ||
      |  (CASE WHEN substr(h, 1, 1) IN ('0','1','2','3') THEN 'com'
      |        WHEN substr(h, 1, 1) IN ('4','5','6','7') THEN 'org'
      |        WHEN substr(h, 1, 1) IN ('8','9','a','b') THEN 'net'
      |        ELSE 'io' END) ||
      |  (CASE WHEN substr(h, 15, 1) IN ('0','1','2','3','4','5')
      |        THEN '/' || substr(h, 3, 4)
      |        WHEN substr(h, 15, 1) IN ('6','7','8','9','a')
      |        THEN '/' || substr(h, 3, 4) || '/' || substr(h, 7, 4)
      |        ELSE '/' || substr(h, 3, 4) || '/' || substr(h, 7, 4) ||
      |             '/' || substr(h, 11, 4) END) ||
      |  (CASE WHEN substr(h, 16, 1) IN ('0','1','2','3','4','5','6','7')
      |        THEN '?ref=' || substr(h, 17, 2) ELSE '' END) AS url
      |FROM (SELECT *, md5(doc_id::VARCHAR) AS h FROM documents) d""".stripMargin

  /** t_url_extract — URL decomposition per document: scheme, host,
    * registered domain, TLD, path depth, query presence. The host /
    * path / query splits go through Spark's NATIVE `parse_url`
    * (codegen'd ParseUrl expression — no UDF, no regex on the hot
    * path); domain/TLD are string ops on the host. Narrow map — the
    * scan's the only stage, any corpus size. */
  def tUrlExtract(spark: SparkSession, dir: String): DataFrame = {
    val d = withUrl(Tables(spark, dir).documents.select(col("doc_id"), col("source")))
    d.select(
        col("doc_id"),
        col("url"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY")).as("q"))
      .select(
        col("doc_id"),
        col("url"),
        col("host"),
        regexp_replace(col("host"), "^www\\.", "").as("reg_domain"),
        substring_index(col("host"), ".", -1).as("tld"),
        (length(col("path")) - length(regexp_replace(col("path"), "/", "")))
          .cast("long").as("path_depth"),
        col("q").isNotNull.as("has_query"))
      .orderBy("doc_id")
  }

  val tUrlExtractSql: String =
    s"""WITH u AS ($withUrlSql),
       |p AS (
       |  SELECT doc_id, url,
       |    regexp_extract(url, '^https://([^/?#]+)', 1) AS host,
       |    regexp_extract(url, '^https://[^/?#]+(/[^?#]*)', 1) AS path,
       |    CASE WHEN contains(url, '?') THEN true ELSE false END AS has_query
       |  FROM u)
       |SELECT doc_id, url, host,
       |  regexp_replace(host, '^www\\.', '') AS reg_domain,
       |  regexp_extract(host, '([^.]+)$$', 1) AS tld,
       |  (length(path) - length(replace(path, '/', '')))::BIGINT AS path_depth,
       |  has_query
       |FROM p ORDER BY doc_id""".stripMargin

  /** d_domain_budget — cap each registered domain at [[DomainCap]]
    * documents, keeping the longest (quality proxy: n_chars DESC,
    * doc_id ASC tiebreak — deterministic, no RNG). One hash shuffle
    * on reg_domain; the row_number window distributes over the
    * domain key whose cardinality scales WITH the corpus, and
    * TopK-per-domain state is a single counter per partition-local
    * group. Emits the kept set with its in-domain rank. */
  def dDomainBudget(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = withUrl(Tables(spark, dir).documents
      .select(col("doc_id"), col("source"), col("n_chars")))
    val domain = regexp_replace(
      parse_url(col("url"), lit("HOST")), "^www\\.", "")
    val w = Window.partitionBy(col("reg_domain"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    d.withColumn("reg_domain", domain)
      .withColumn("rank_in_domain", row_number().over(w).cast("long"))
      .filter(col("rank_in_domain") <= DomainCap)
      .select("doc_id", "reg_domain", "n_chars", "rank_in_domain")
      .orderBy("reg_domain", "rank_in_domain")
  }

  val dDomainBudgetSql: String =
    s"""WITH u AS ($withUrlSql),
       |r AS (
       |  SELECT doc_id, n_chars,
       |    regexp_replace(regexp_extract(url, '^https://([^/?#]+)', 1),
       |                   '^www\\.', '') AS reg_domain,
       |    row_number() OVER (PARTITION BY
       |        regexp_replace(regexp_extract(url, '^https://([^/?#]+)', 1),
       |                       '^www\\.', '')
       |      ORDER BY n_chars DESC, doc_id ASC) AS rank_in_domain
       |  FROM u)
       |SELECT doc_id, reg_domain, n_chars, rank_in_domain::BIGINT AS rank_in_domain
       |FROM r WHERE rank_in_domain <= $DomainCap
       |ORDER BY reg_domain, rank_in_domain""".stripMargin

  /** Blocklist rules — the two shapes real URL blocklists (UT1 and
    * its descendants in RefinedWeb/FineWeb-style curation) carry:
    * exact registered domains and TLD wildcards. Literal here; in
    * production a table of millions of rows that still BROADCASTS
    * (tens of MB) — or, past broadcast size, becomes a bloom-filter
    * pushdown on the probe side plus one small-side shuffle join. */
  val BlockedDomains: Seq[String] = Seq("src3.net", "src7.com", "src11.org", "src15.io")
  val BlockedTlds: Seq[String] = Seq("io")

  /** d_blocklist — URL blocklist filtering: every document scored
    * against the domain/TLD blocklist, emitting the verdict and the
    * matching rule (exact-domain match wins over the TLD wildcard,
    * mirroring blocklist tooling precedence). Two broadcast left
    * joins against rule tables — the corpus side stays narrow (no
    * corpus shuffle at any scale); the presentation sort is the only
    * exchange. Verdict column kept (rather than filtering) so the
    * gate checks both classes; `.filter(!blocked)` is the production
    * tail. */
  def dBlocklist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = withUrl(Tables(spark, dir).documents.select(col("doc_id"), col("source")))
    val host = parse_url(col("url"), lit("HOST"))
    val parsed = d.select(
      col("doc_id"),
      regexp_replace(host, "^www\\.", "").as("reg_domain"))
      .withColumn("tld", substring_index(col("reg_domain"), ".", -1))
    val domRules = BlockedDomains.toDF("b_domain")
    val tldRules = BlockedTlds.toDF("b_tld")
    parsed
      .join(broadcast(domRules), col("reg_domain") === col("b_domain"), "left")
      .join(broadcast(tldRules), col("tld") === col("b_tld"), "left")
      .select(
        col("doc_id"), col("reg_domain"), col("tld"),
        (col("b_domain").isNotNull || col("b_tld").isNotNull).as("blocked"),
        when(col("b_domain").isNotNull, concat(lit("domain:"), col("b_domain")))
          .when(col("b_tld").isNotNull, concat(lit("tld:"), col("b_tld")))
          .otherwise(lit(null).cast("string")).as("rule"))
      .orderBy("doc_id")
  }

  val dBlocklistSql: String = {
    val doms = BlockedDomains.map(d => s"('$d')").mkString(", ")
    val tlds = BlockedTlds.map(t => s"('$t')").mkString(", ")
    s"""WITH u AS ($withUrlSql),
       |p AS (
       |  SELECT doc_id,
       |    regexp_replace(regexp_extract(url, '^https://([^/?#]+)', 1),
       |                   '^www\\.', '') AS reg_domain
       |  FROM u),
       |pt AS (
       |  SELECT doc_id, reg_domain,
       |    regexp_extract(reg_domain, '([^.]+)$$', 1) AS tld
       |  FROM p),
       |bd(b_domain) AS (VALUES $doms),
       |bt(b_tld) AS (VALUES $tlds)
       |SELECT pt.doc_id, pt.reg_domain, pt.tld,
       |  (bd.b_domain IS NOT NULL OR bt.b_tld IS NOT NULL) AS blocked,
       |  CASE WHEN bd.b_domain IS NOT NULL THEN 'domain:' || bd.b_domain
       |       WHEN bt.b_tld IS NOT NULL THEN 'tld:' || bt.b_tld
       |       ELSE NULL END AS rule
       |FROM pt
       |LEFT JOIN bd ON pt.reg_domain = bd.b_domain
       |LEFT JOIN bt ON pt.tld = bt.b_tld
       |ORDER BY doc_id""".stripMargin
  }

  /** Digit share of path characters above which a URL looks like a
    * session-id / machine-generated path (the C4/RefinedWeb URL-filter
    * heuristic class). On md5-hex paths the share is distributed
    * around 10/16, so the threshold genuinely splits the corpus. */
  val UrlDigitTau = 0.6

  /** Path depth above which a URL is considered deep navigation. */
  val UrlMaxDepth = 2

  /** t_url_quality — per-URL quality features + keep decision: the
    * URL-filter stage crawl pipelines run BEFORE fetching or keeping
    * content (RefinedWeb §3.1 / C4 filter most documents on URL
    * features alone — it is the cheapest filter in the stack because
    * it reads no content at all): path depth, path length, query-
    * parameter count, tracking-parameter presence, digit share of the
    * path (session-id / machine-generated paths are digit-heavy), and
    * the resulting keep flag — drop tracking links, deep navigation,
    * and digit-heavy paths. Entirely a narrow map over the scan
    * (string ops on the url column; `parse_url` is Spark's native
    * codegen'd expression) — zero shuffles at any corpus size beyond
    * the presentation sort. The rules are named constants; a real
    * deployment extends the rule set, not the shape.
    *
    * Float parity: digit_frac is a ratio of two small integers —
    * correctly-rounded IEEE division is bit-identical in both
    * engines, rounded once at the output (stableRound(4)). A zero
    * path ('/' or '' — never produced by the synthetic withUrl, but
    * routine on a real crawl) routes through an explicit CASE to 0.0
    * in BOTH engines: an unguarded 0/0 is NaN in Spark vs NULL in
    * DuckDB, and the keep flag would diverge on exactly the corpus
    * swap this operator exists for. */
  def tUrlQuality(spark: SparkSession, dir: String): DataFrame =
    urlQualityOf(withUrl(
      Tables(spark, dir).documents.select(col("doc_id"), col("source"))))

  /** The feature map on an arbitrary (doc_id, url) frame —
    * [[tUrlQuality]] minus the synthetic-URL derivation, so the spec
    * can drive corpus shapes withUrl never emits (empty / bare-slash
    * paths). */
  private[graft] def urlQualityOf(d: DataFrame): DataFrame = {
    // path coalesced to '': a pathless URL must read as depth 0 /
    // 0 chars, not poison every feature (and the keep flag) to NULL
    val p = d.select(col("doc_id"), col("url"),
      coalesce(parse_url(col("url"), lit("PATH")), lit("")).as("path"),
      parse_url(col("url"), lit("QUERY")).as("q"))
    val chars = length(regexp_replace(col("path"), "/", ""))
    val digits = length(regexp_replace(col("path"), "[^0-9]", ""))
    p.select(
        col("doc_id"), col("url"),
        (length(col("path")) - length(regexp_replace(col("path"), "/", "")))
          .cast("long").as("path_depth"),
        chars.cast("long").as("path_chars"),
        // the derived URLs carry at most one param; production rules
        // count '&'-separated pairs the same way
        when(col("q").isNull, 0L)
          .otherwise(length(col("q")) - length(call_function("replace",
            col("q"), lit("&"), lit(""))) + 1L).cast("long").as("n_params"),
        coalesce(col("q").startsWith("ref="), lit(false)).as("is_tracking"),
        when(chars === 0, lit(0.0))
          .otherwise(stableRound(digits.cast("double") / chars.cast("double"), 4))
          .as("digit_frac"))
      .withColumn("keep",
        !col("is_tracking") && col("path_depth") <= UrlMaxDepth &&
          col("digit_frac") <= UrlDigitTau)
      .orderBy("doc_id")
  }

  val tUrlQualitySql: String =
    s"""WITH u AS ($withUrlSql),
       |p AS (
       |  SELECT doc_id, url,
       |    regexp_extract(url, '^https://[^/?#]+(/[^?#]*)', 1) AS path,
       |    CASE WHEN contains(url, '?')
       |         THEN regexp_extract(url, '[?](.*)$$', 1) END AS q
       |  FROM u),
       |f AS (
       |  SELECT doc_id, url,
       |    (length(path) - length(replace(path, '/', '')))::BIGINT AS path_depth,
       |    length(replace(path, '/', ''))::BIGINT AS path_chars,
       |    (CASE WHEN q IS NULL THEN 0
       |          ELSE length(q) - length(replace(q, '&', '')) + 1 END)::BIGINT AS n_params,
       |    COALESCE(q LIKE 'ref=%', false) AS is_tracking,
       |    CASE WHEN length(replace(path, '/', '')) = 0 THEN 0.0
       |         ELSE ${stableRoundSql(
                "length(regexp_replace(path, '[^0-9]', '', 'g'))::DOUBLE /\n" +
                "           length(replace(path, '/', ''))::DOUBLE", 4)} END AS digit_frac
       |  FROM p)
       |SELECT f.*,
       |  (NOT is_tracking AND path_depth <= $UrlMaxDepth
       |     AND digit_frac <= $UrlDigitTau) AS keep
       |FROM f ORDER BY doc_id""".stripMargin

  /** d_dedup_url — canonical-URL deduplication of fetch records: the
    * crawl-side dedup that runs BEFORE any content hashing, because a
    * page fetched under `www.`/apex, with and without tracking
    * params, or with a trailing slash is the same page and refetching
    * or double-counting it wastes the whole downstream pipeline.
    * Canonicalization here: strip the query string (the derived
    * corpus carries only tracking-class params — `ref=`/`utm_*`; a
    * production rule set strips a param allowlist instead), collapse
    * `www.` onto the apex, drop a trailing slash. One fetch per
    * canonical URL survives (lowest fetch_id — first-crawled wins);
    * every fetch row reports its canonical form, alias-group size,
    * and keep flag so the drop is auditable.
    *
    * The fetch log is DERIVED deterministically (the [[Graph.edges]]
    * data-shim discipline): every document's [[withUrl]] URL is one
    * fetch, and docs whose md5 char 19 is 0-7 also surface a second
    * fetch under the classic alias transform (www toggled + a
    * `utm_source` param appended) — so alias groups are real and the
    * collapse is measurable, bit-identically in both engines. On a
    * real crawl the fetch log is the input table and everything from
    * `canon_url` down is unchanged.
    *
    * Scale shape: canonicalization is a narrow per-row map (anchored
    * regexes, no UDF); the group stats are ONE hash aggregation on
    * canon_url (map-side combined count+min) joined back — the
    * d_dedup_exact shape. Alias-group skew is bounded by the alias
    * transform fanout, not the corpus. */
  def dDedupUrl(spark: SparkSession, dir: String): DataFrame = {
    val d = withUrl(
      Tables(spark, dir).documents.select(col("doc_id"), col("source")))
      .select(col("doc_id"), col("url"))
    val wwwToggled = when(col("url").startsWith("https://www."),
        regexp_replace(col("url"), "^https://www\\.", "https://"))
      .otherwise(regexp_replace(col("url"), "^https://", "https://www."))
    val variant = when(col("url").contains("?"),
        concat(wwwToggled, lit("&utm_source=feed")))
      .otherwise(concat(wwwToggled, lit("?utm_source=feed")))
    val hasAlias = substring(md5(col("doc_id").cast("string")), 19, 1)
      .isInCollection("01234567".map(_.toString))
    val fetches = d
      .select(col("doc_id"), (col("doc_id") * 2).as("fetch_id"), col("url"))
      .unionByName(d.filter(hasAlias)
        .select(col("doc_id"), (col("doc_id") * 2 + 1).as("fetch_id"),
          variant.as("url")))
    val canon = regexp_replace(regexp_replace(regexp_replace(
      col("url"), "\\?.*$", ""), "^https://www\\.", "https://"), "/$", "")
    val withCanon = fetches.withColumn("canon_url", canon)
    val groups = withCanon.groupBy(col("canon_url"))
      .agg(count(lit(1)).as("n_aliases"), min(col("fetch_id")).as("first_id"))
    withCanon.join(groups, Seq("canon_url"))
      .select(col("fetch_id"), col("doc_id"), col("url"), col("canon_url"),
        col("n_aliases"), (col("fetch_id") === col("first_id")).as("keep"))
      .orderBy("canon_url", "fetch_id")
  }

  val dDedupUrlSql: String =
    s"""WITH u AS ($withUrlSql),
       |base AS (SELECT doc_id, url FROM u),
       |fetches AS (
       |  SELECT doc_id, (doc_id * 2)::BIGINT AS fetch_id, url FROM base
       |  UNION ALL
       |  SELECT doc_id, (doc_id * 2 + 1)::BIGINT AS fetch_id,
       |    (CASE WHEN url LIKE 'https://www.%'
       |          THEN regexp_replace(url, '^https://www\\.', 'https://')
       |          ELSE regexp_replace(url, '^https://', 'https://www.') END) ||
       |    (CASE WHEN contains(url, '?') THEN '&utm_source=feed'
       |          ELSE '?utm_source=feed' END) AS url
       |  FROM base
       |  WHERE substr(md5(doc_id::VARCHAR), 19, 1) IN
       |    ('0','1','2','3','4','5','6','7')),
       |wc AS MATERIALIZED (
       |  SELECT fetch_id, doc_id, url,
       |    regexp_replace(regexp_replace(regexp_replace(
       |      url, '\\?.*$$', ''), '^https://www\\.', 'https://'),
       |      '/$$', '') AS canon_url
       |  FROM fetches),
       |g AS (
       |  SELECT canon_url, count(*)::BIGINT AS n_aliases,
       |    min(fetch_id) AS first_id
       |  FROM wc GROUP BY canon_url)
       |SELECT wc.fetch_id, wc.doc_id, wc.url, wc.canon_url, g.n_aliases,
       |  (wc.fetch_id = g.first_id) AS keep
       |FROM wc JOIN g ON wc.canon_url = g.canon_url
       |ORDER BY wc.canon_url, wc.fetch_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_url_extract" -> tUrlExtract,
    "t_url_quality" -> tUrlQuality,
    "d_domain_budget" -> dDomainBudget,
    "d_blocklist" -> dBlocklist,
    "d_dedup_url" -> dDedupUrl,
  )

  def oracles: Map[String, String] = Map(
    "t_url_extract" -> tUrlExtractSql,
    "t_url_quality" -> tUrlQualitySql,
    "d_domain_budget" -> dDomainBudgetSql,
    "d_blocklist" -> dBlocklistSql,
    "d_dedup_url" -> dDedupUrlSql,
  )
}
