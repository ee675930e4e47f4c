package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, Literal, Lower, RegExpReplace, StringTrim, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass form of [[graft.functions.TextFunctions.normText]]'s
  * `trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "),
  * " +", " "))` chain — the hottest expression in the text suite (it
  * normalizes every document in ~40 operators, twice through the Java
  * regex engine per row).
  *
  * Fast path: when the input is pure ASCII (every byte < 0x80 — true
  * for the whole corpus at every SF), the chain's semantics reduce to
  * one byte scan: uppercase folds +32, [a-z0-9] pass through, every
  * other byte becomes a space, space runs collapse, ends trim. This is
  * provably the same output — on ASCII, lower() is the byte fold and
  * the two regexes are per-byte classifications (ExprSpec pins
  * equality property-style on randomized inputs).
  *
  * Fallback: any non-ASCII byte routes the WHOLE value through an
  * embedded instance of the original expression tree itself
  * (Lower→RegExpReplace→RegExpReplace→StringTrim over a bound slot),
  * constructed at plan time exactly as the Column chain would be — so
  * non-ASCII inputs produce bit-identical output BY CONSTRUCTION, not
  * by reimplementation. (A non-ASCII char is ≥2 bytes, all ≥ 0x80, so
  * the ASCII test can never mistake one.)
  */
case class NormText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  /** The original chain over a bound input slot. @transient lazy: it
    * is (re)built at FIRST EVAL on each executor/task, so
    * conf-dependent pieces (e.g. Lower's ICU mode) come from the
    * task-propagated SQLConf — the same conf a task evaluating the
    * equivalent Column chain would see, which is what equality needs.
    * (All graft entry points pin the ICU conf session-wide and the
    * corpus is ASCII-asserted, so in practice the fallback never fires
    * with a conf that differs from plan time.) */
  @transient private lazy val fallback: Expression =
    StringTrim(
      RegExpReplace(
        RegExpReplace(
          Lower(BoundReference(0, StringType, nullable = true)),
          Literal("[^a-z0-9 ]"), Literal(" ")),
        Literal(" +"), Literal(" ")))

  private def normAscii(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    val in = s.getBytes
    val out = new Array[Byte](n)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val b = in(i)
      val c: Byte =
        if (b >= 'a' && b <= 'z' || b >= '0' && b <= '9') b
        else if (b >= 'A' && b <= 'Z') (b + 32).toByte
        else ' '
      if (c == ' ') {
        if (o > 0) pendingSpace = true // leading spaces trim away
      } else {
        if (pendingSpace) { out(o) = ' '; o += 1; pendingSpace = false }
        out(o) = c; o += 1
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    val b = s.getBytes
    var i = 0
    while (i < n) { if (b(i) < 0) return false; i += 1 }
    true
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (isAscii(s)) normAscii(s)
    else fallback.eval(InternalRow(s))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("normText", this, classOf[NormText].getName)
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $self.evalOne($v);
       """.stripMargin
    })
  }

  /** Public single-value entry for the generated code. */
  def evalOne(s: UTF8String): UTF8String =
    nullSafeEval(s).asInstanceOf[UTF8String]

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
