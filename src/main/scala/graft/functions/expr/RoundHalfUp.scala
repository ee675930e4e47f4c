package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Single-evaluation form of [[graft.functions.Parity.stableRound]]'s
  * `when(isnan(c) || abs(c) = Inf, c).otherwise(floor(c·10^s + ½) / 10^s)`
  * chain.
  *
  * Bit-identical semantics to the Column-built chain — including the
  * non-finite pass-through and the exact op sequence `Math.floor` →
  * saturating long cast (Spark's FLOOR on double yields LONG) →
  * long→double promotion → correctly-rounded divide by the same
  * power-of-ten double — but the child expression is evaluated ONCE.
  * The `when/otherwise` spelling references its argument four times
  * (isnan, abs, pass-through, floor), and where the argument is itself
  * expensive (the sorted-fold `aggregate(...)` — a CodegenFallback
  * higher-order function — or a long arithmetic chain) the physical
  * plan carried four copies of it per row; measured on t_bm25's score
  * projection that fold ran 4× per output row. One more codegen win
  * rides along: with no HOF in the rounding itself, projections that
  * round plain arithmetic stay inside whole-stage codegen.
  */
case class RoundHalfUp(child: Expression, scale: Int)
    extends UnaryExpression {

  require(scale >= 0 && scale <= 15,
    s"RoundHalfUp scale $scale outside the lossless range")

  private val p: Double = math.pow(10, scale)

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[Double]
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) v
    // the exact chain of the Column form: Math.floor → saturating long
    // cast (Spark FLOOR(double) → LONG) → long→double → divide
    else (math.floor(v * p + 0.5).toLong).toDouble / p
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val pl = s"${p}D"
      s"""
         |if (java.lang.Double.isNaN($v) || java.lang.Double.isInfinite($v)) {
         |  ${ev.value} = $v;
         |} else {
         |  ${ev.value} = ((double) ((long) java.lang.Math.floor($v * $pl + 0.5D))) / $pl;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
