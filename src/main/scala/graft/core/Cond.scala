package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}

/** Spark-first re-expression of the reference's condition surface.
  *
  * The reference models a query as a slice of `Condition{column, cmp}`
  * ANDed together (reference src/lib.rs:130-137), where `cmp` is
  * `Equal(Value)` and a `Value` is either a constant or another column
  * of the same row (src/cmp.rs:8-49). Its `RangeIndex` additionally
  * serves `between(Bound, Bound)` scans with inclusive/exclusive
  * bounds (src/idx.rs:83-87), so the DSL here exposes both equality
  * and range comparisons.
  *
  * Rather than evaluating conditions row-by-row against an index pick
  * (src/lib.rs:98-120), `toColumn` lowers every condition to a Catalyst
  * predicate: Catalyst then does what shortcut's `using_index` did by
  * hand — pick the access path (parquet pushdown, partition/bucket
  * pruning, min/max row-group skipping) from the same declarative
  * conditions, at whatever scale the scan runs.
  */
sealed trait Value {
  def toColumn: Column = this match {
    case Value.Const(v)    => lit(v)
    case Value.ColRef(name) => col(name)
  }

  /** Human-readable rendering — the reference's `Display` impl
    * (src/cmp.rs:79-86: a column ref renders bracketed, a constant
    * bare) with column names in place of indices. */
  def describe: String = this match {
    case Value.Const(v)     => s"$v"
    case Value.ColRef(name) => s"[$name]"
  }
}

object Value {
  /** A constant literal (reference src/cmp.rs:10 `Value::Const`). */
  final case class Const(v: Any) extends Value
  /** Another column of the same row (src/cmp.rs:14 `Value::Column`).
    * The reference notes such comparisons can never use an index; in
    * Spark they simply stay a post-scan filter. */
  final case class ColRef(name: String) extends Value

  def of(v: Any): Value = Const(v)
  def column(name: String): Value = ColRef(name)
}

/** Comparison ops. `Equal` is the reference's whole enum
  * (src/cmp.rs:46-49); the range forms express what `RangeIndex
  * .between` serves (src/idx.rs:132-134, `std::ops::Bound`
  * semantics: each end inclusive or exclusive). */
sealed trait Comparison
object Comparison {
  final case class Equal(v: Value) extends Comparison
  final case class Less(v: Value, orEqual: Boolean) extends Comparison
  final case class Greater(v: Value, orEqual: Boolean) extends Comparison
  /** between(min, max) with Bound-style inclusivity flags. */
  final case class Between(min: Value, minIncl: Boolean, max: Value, maxIncl: Boolean)
      extends Comparison
}

final case class Condition(column: String, cmp: Comparison) {
  /** `"[col] = x"` / `"[a] = [b]"` — the reference's `Display`
    * rendering (src/cmp.rs:88-100, pinned by its `display` test);
    * the range forms extend it with comparison operators and
    * `std::ops::Bound`-style interval brackets (inclusive `[ ]`,
    * exclusive `( )`). */
  def describe: String = {
    val c = s"[$column]"
    cmp match {
      case Comparison.Equal(v)          => s"$c = ${v.describe}"
      case Comparison.Less(v, true)     => s"$c <= ${v.describe}"
      case Comparison.Less(v, false)    => s"$c < ${v.describe}"
      case Comparison.Greater(v, true)  => s"$c >= ${v.describe}"
      case Comparison.Greater(v, false) => s"$c > ${v.describe}"
      case Comparison.Between(min, minIncl, max, maxIncl) =>
        val lo = if (minIncl) "[" else "("
        val hi = if (maxIncl) "]" else ")"
        s"$c in $lo${min.describe}, ${max.describe}$hi"
    }
  }

  override def toString: String = describe

  def toColumn: Column = {
    val c = col(column)
    cmp match {
      case Comparison.Equal(v)          => c === v.toColumn
      case Comparison.Less(v, true)     => c <= v.toColumn
      case Comparison.Less(v, false)    => c < v.toColumn
      case Comparison.Greater(v, true)  => c >= v.toColumn
      case Comparison.Greater(v, false) => c > v.toColumn
      case Comparison.Between(min, minIncl, max, maxIncl) =>
        val lo = if (minIncl) c >= min.toColumn else c > min.toColumn
        val hi = if (maxIncl) c <= max.toColumn else c < max.toColumn
        lo && hi
    }
  }
}

object Condition {
  /** Shorthand constructors mirroring the reference's test usage. */
  def eq(column: String, v: Any): Condition =
    Condition(column, Comparison.Equal(Value.of(v)))
  def eqCol(column: String, other: String): Condition =
    Condition(column, Comparison.Equal(Value.column(other)))
  def between(column: String, min: Any, max: Any,
      minIncl: Boolean = true, maxIncl: Boolean = true): Condition =
    Condition(column, Comparison.Between(Value.of(min), minIncl, Value.of(max), maxIncl))

  /** AND of all conditions — the semantics of `Store::find(conds)`
    * (src/lib.rs:130-137). An empty slice matches everything, like the
    * reference's full-scan fallback. */
  def all(conds: Seq[Condition]): Column =
    conds.map(_.toColumn).reduceOption(_ && _).getOrElse(lit(true))
}
