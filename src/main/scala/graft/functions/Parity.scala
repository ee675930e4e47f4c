package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Cross-engine float-parity helpers shared by the operators and
  * their DuckDB oracle SQL (SURVEY §6).
  *
  * Rounding is the one arithmetic step whose built-in implementations
  * legitimately disagree between engines on the SAME double: Spark's
  * `round` goes through the shortest decimal representation
  * (BigDecimal HALF_UP), DuckDB's scales by 10^s and rounds
  * half-away-from-zero — on a value like 52724.244999999995 (whose
  * ×100 lands exactly on …24.5) they return 52724.24 and 52724.25
  * respectively. [[stableRound]] replaces both with one explicit
  * chain of correctly-rounded IEEE ops — ⌊x·10^s + ½⌋ / 10^s — so
  * identical input doubles ALWAYS produce identical output doubles.
  * Semantics: half-up toward +∞ at scale s (for the ratio/percentile
  * columns here, indistinguishable from the old behavior except on
  * exact-tie inputs, where the engines used to disagree with each
  * other anyway).
  *
  * The result is not the exact decimal (x·10^s is rarely a
  * representable double, and the final division is correctly rounded,
  * not exact) — what parity needs is only that both engines run the
  * SAME correctly-rounded ops, which `1e<s>` parsing to the identical
  * power-of-ten double guarantees. The scale cap of 15 keeps every
  * value rounded in this codebase far below 2^53 after scaling, so
  * ⌊·⌋'s LONG intermediate on the Spark side is lossless.
  */
object Parity {

  /** ⌊c·10^s + ½⌋ / 10^s — engine-stable round-half-up at scale s.
    *
    * NaN and ±Infinity pass through UNTOUCHED: Spark's `floor` on a
    * double yields LONG, which would silently collapse NaN to 0 and
    * ±Inf to ±Long.MaxValue — while DuckDB's all-DOUBLE chain
    * propagates them — so the guard is what keeps the two engines
    * identical on non-finite inputs (the built-in round() used to
    * preserve them on both sides). */
  def stableRound(c: Column, s: Int): Column = {
    require(s >= 0 && s <= 15, s"stableRound scale $s outside the lossless range")
    // Built as ONE custom expression instead of the equivalent
    // when(isnan(c) || abs(c) = Inf, c).otherwise(floor(c·10^s + ½)/10^s)
    // chain: that spelling evaluates `c` four times per row (isnan,
    // abs, pass-through, floor), which quadruples the cost wherever
    // `c` is an expensive argument — the sorted-fold aggregate() in
    // the BM25/logprob/JSD family is the worst case (measured 4
    // interpreted fold evaluations per output row in t_bm25's score
    // projection). RoundHalfUp runs the identical IEEE op sequence
    // once; ParitySpec pins chain ≡ expression across the double
    // range including NaN/±Inf/ties.
    import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
    column(graft.functions.expr.RoundHalfUp(expression(c.cast("double")), s))
  }

  /** The DuckDB twin of [[stableRound]], as SQL text over `e`. This
    * is the CANONICAL form: existing oracles spell it inline (the
    * multi-line chains read better in place) and ParitySpec pins
    * every occurrence — and any reappearance of round() — against
    * this template, so the copies cannot drift silently; new oracles
    * should interpolate the helper. DuckDB's floor stays DOUBLE, so
    * NaN/±Inf propagate without a guard. */
  def stableRoundSql(e: String, s: Int): String = {
    require(s >= 0 && s <= 15, s"stableRoundSql scale $s outside the lossless range")
    s"floor(($e) * 1e$s + 0.5) / 1e$s"
  }

  /** Fixed-point integer cents — ⌊x·100 + ½⌋ as LONG: the SURVEY §6
    * discipline that makes money aggregates order-free and hash-exact
    * (integer sums commute; float sums do not). ONE definition shared
    * by the streaming view maintenance and the batch MV rewrite so
    * the two sides can never drift apart. */
  def cents(c: Column): Column =
    floor(c * lit(100) + lit(0.5)).cast("long")

  /** The DuckDB twin of [[cents]] over `e`. DuckDB's sum over BIGINT
    * returns HUGEINT — callers cast the SUM back (`::BIGINT`), not
    * the per-row value. */
  def centsSql(e: String): String =
    s"CAST(floor(($e) * 100 + 0.5) AS BIGINT)"
}
