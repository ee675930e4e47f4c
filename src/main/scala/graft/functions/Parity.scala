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
  * 10^s is an exact double for s ≤ 22, and every value rounded in
  * this codebase keeps x·10^s far below 2^53, so the chain loses no
  * precision; Spark's `floor` yields LONG and the final division
  * re-widens exactly. Use [[stableRoundSql]] for the oracle side —
  * `1e<s>` parses to the same exact double.
  */
object Parity {

  /** ⌊c·10^s + ½⌋ / 10^s — engine-stable round-half-up at scale s. */
  def stableRound(c: Column, s: Int): Column = {
    require(s >= 0 && s <= 15, s"stableRound scale $s out of the exact-double range")
    val p = math.pow(10, s)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** The DuckDB twin of [[stableRound]], as SQL text over `e`. */
  def stableRoundSql(e: String, s: Int): String = {
    require(s >= 0 && s <= 15, s"stableRoundSql scale $s out of the exact-double range")
    s"floor(($e) * 1e$s + 0.5) / 1e$s"
  }
}
