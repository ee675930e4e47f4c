package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the LLM-data-pipeline operators.
  *
  * Everything here is built from `org.apache.spark.sql.functions`
  * (codegen'd / native expressions — no UDFs), and every hash is
  * md5-derived so a DuckDB oracle can reproduce values bit-for-bit
  * (SURVEY.md §6): Spark `conv(substr(md5(x),1,8),16,10)::long` ≡
  * DuckDB `('0x'||substr(md5(x),1,8))::bigint`.
  */
object TextFunctions {

  /** Normalize: lowercase, non-alphanumerics → space, collapse runs,
    * trim. Identical semantics in DuckDB with the 'g' flag.
    *
    * Implemented as the single-pass [[graft.functions.expr.NormText]]
    * expression: on ASCII input (the entire corpus) one byte scan
    * replaces the lower + two-regex-pass + trim chain — the hottest
    * expression in the text suite — and non-ASCII input routes through
    * an embedded instance of the original chain itself, so the output
    * is identical for every input by construction (ExprSpec pins it). */
  def normText(c: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
    column(graft.functions.expr.NormText(expression(c)))
  }

  /** SQL mirror of [[normText]] over a `text` column — the ONE copy
    * every oracle references. Fingerprints, shingles, and the curation
    * keeper filter all hash its output, so a drift between this
    * string and normText (or a private duplicate of it) silently
    * breaks hash parity across operators. */
  val normSql: String =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  /** Normalized word array. */
  def words(c: Column): Column = split(normText(c), " ")

  /** Whitespace token count on the raw text. */
  def tokenCountWs(c: Column): Column = size(split(trim(c), "\\s+"))

  /** 32-bit hash (as long) from the md5 hex prefix — the portable
    * cross-engine hash primitive. Implemented as the single-digest
    * [[graft.functions.expr.Md5_32]] expression: the historical
    * `conv(substring(md5(c), 1, 8), 16, 10).cast("long")` chain
    * hex-encodes the digest, substrings it, and string-parses base 16
    * per call — the expression reads the same 4 digest bytes directly
    * (ExprSpec pins ≡, and every hash-consuming oracle re-proves it). */
  def md5_32(c: Column): Column =
    graft.functions.expr.FoldExpressions.md5_32(c)

  /** Count non-overlapping occurrences of a literal marker via the
    * replace trick — no regex involved, so engine-proof (DuckDB
    * `replace` ≡ Spark `replace`). */
  def markerCount(c: Column, marker: String): Column =
    ((length(c) - length(call_function("replace", c, lit(marker), lit("")))) /
      lit(marker.length)).cast("long")

  /** Word n-gram shingles (distinct) from a MATERIALIZED word-array
    * column, joined by single spaces. Empty array when the doc has
    * < n words.
    *
    * `w` must be a plain column reference: an expression referenced
    * inside a per-element lambda (`element_at(w, i)`) is re-evaluated
    * on every access, so an inlined `split(regexp_replace(...))`
    * turns shingling O(n²)-in-regex-calls per row (measured 40×
    * slowdown). Project the words first. */
  def shinglesFromWords(w: Column, n: Int): Column =
    array_distinct(
      transform(
        when(size(w) >= n, sequence(lit(1), size(w) - (n - 1)))
          .otherwise(array().cast("array<int>")),
        i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k)): _*)))

  /** Convenience single-expression form — fine for small inputs and
    * specs; bulk pipelines should project [[words]] first and use
    * [[shinglesFromWords]]. */
  def shingles(c: Column, n: Int): Column = shinglesFromWords(words(c), n)

  /** Marker words per language for the n-gram language-ID heuristic.
    * Deliberately tiny and literal: the oracle replays the exact same
    * scoring, so the *mechanism* (marker scoring + argmax) is what's
    * verified. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " is "),
    "de" -> Seq(" der ", " und ", " die ", " ist "),
    "fr" -> Seq(" le ", " la ", " et ", " est "),
    "es" -> Seq(" el ", " la ", " de ", " es "),
  )

  /** Padded normalized text so markers match at both ends. */
  def padded(c: Column): Column = concat(lit(" "), normText(c), lit(" "))

  /** Total marker hits for one language. */
  def langScore(c: Column, lang: String): Column =
    langMarkers.toMap.apply(lang)
      .map(m => markerCount(padded(c), m))
      .reduce(_ + _)

  /** Argmax language; ties broken by the fixed language order;
    * "und" (undetermined) when no marker hits at all. */
  def langId(c: Column): Column = {
    val scores = langMarkers.map { case (l, _) => (l, langScore(c, l)) }
    val best = scores.map(_._2).reduce(greatest(_, _))
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }
}
