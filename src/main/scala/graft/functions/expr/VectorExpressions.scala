package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the vector/hash hot loops.
  *
  * The higher-order-function formulations (`aggregate(zip_with(...))`)
  * are semantically identical but evaluate one lambda call per
  * element; these expressions run the same arithmetic — same IEEE op
  * order, so results are bit-identical and the DuckDB oracles keep
  * matching — as a tight loop with whole-stage codegen.
  */

/** Σ aᵢ·bᵢ in double precision, sequential element order. Null if
  * either side is null; arrays must be equal length (min is used,
  * matching zip_with-on-equal-lengths usage). Elements float or
  * double. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // Fresh names: several DotProducts can share one codegen stage
      // (e.g. the LSH sign tests) — fixed names would collide and kick
      // the whole stage back to interpreted evaluation.
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val lGet = if (elemIsFloat(left)) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      val rGet = if (elemIsFloat(right)) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ($lGet) * ($rGet);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Frequency-weighted 32-bit SimHash over an array<long> of word
  * hashes, single pass: bit j set iff Σ ((h>>j & 1)*2 - 1) > 0.
  * Exactly [[graft.operators.Dedup.simhashFromHashes]] semantics. */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val sums = new Array[Long](32)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 32) {
        sums(j) += ((h >> j) & 1L) * 2L - 1L
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (sums(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val sums = ctx.freshName("sums"); val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val out = ctx.freshName("out")
      s"""
         |long[] $sums = new long[32];
         |int $n = $hs.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $hs.getLong($i);
         |  for (int $j = 0; $j < 32; $j++) {
         |    $sums[$j] += (($h >> $j) & 1L) * 2L - 1L;
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 32; $j++) {
         |  if ($sums[$j] > 0) $out |= (1L << $j);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature array over an array<long> of shingle hashes,
  * single pass: sig[i] = min over shingles of ((2i+1)·h + b_i) mod P
  * with b_i = (1000003·(i+1)) mod P — exactly the permutation family
  * in [[graft.operators.Dedup]] (and its DuckDB oracle). Empty input
  * yields sig[i] = P (the aggregate's init value). */
case class MinHashSigs(child: Expression, numPerms: Int, p: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numPerms)(p)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var k = 0
      while (k < numPerms) {
        val v = ((2L * k + 1L) * h + (1000003L * (k + 1)) % p) % p
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val arrCls = classOf[GenericArrayData].getName
      val sig = ctx.freshName("sig"); val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val k = ctx.freshName("k")
      val h = ctx.freshName("h"); val v = ctx.freshName("v")
      s"""
         |long[] $sig = new long[$numPerms];
         |java.util.Arrays.fill($sig, ${p}L);
         |int $n = $hs.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $hs.getLong($i);
         |  for (int $k = 0; $k < $numPerms; $k++) {
         |    long $v = ((2L * $k + 1L) * $h + (1000003L * ($k + 1)) % ${p}L) % ${p}L;
         |    if ($v < $sig[$k]) $sig[$k] = $v;
         |  }
         |}
         |${ev.value} = new $arrCls($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct word n-gram shingles (first-occurrence order, words
  * joined by single spaces) from an array<string> of words — exactly
  * `array_distinct(transform(...concat_ws(element_at...)))` semantics
  * but one pass per row. Beyond speed, this is immune to the
  * CollapseProject hazard: a HOF formulation that references the
  * word-array *expression* inside its lambda re-evaluates it per
  * element once the optimizer collapses the projections. */
/** Shared space-joining of `n` consecutive words starting at `start`.
  * A null word element renders as the empty string (split never
  * produces nulls, but the SQL surface accepts arbitrary arrays and a
  * null would otherwise poison a containsNull=false output array). */
private object WordJoin {
  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
  def join(words: ArrayData, start: Int, n: Int): org.apache.spark.unsafe.types.UTF8String = {
    val parts = new Array[org.apache.spark.unsafe.types.UTF8String](2 * n - 1)
    var k = 0
    while (k < n) {
      val w = words.getUTF8String(start + k)
      parts(2 * k) =
        if (w == null) org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8 else w
      if (k < n - 1) parts(2 * k + 1) = Space
      k += 1
    }
    org.apache.spark.unsafe.types.UTF8String.concat(parts: _*)
  }
}

case class WordShingles(child: Expression, n: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(n > 0, s"shingle width must be positive, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val m = words.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i <= m - n) {
      seen.add(WordJoin.join(words, i, n))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** NON-OVERLAPPING n-word chunks in document order, duplicates kept —
  * the sub-document dedup unit (positions come from posexplode
  * downstream, so the array must preserve order and repeats, unlike
  * [[WordShingles]]' distinct set). Single pass per row for the same
  * reason as WordShingles: slicing a words EXPRESSION once per chunk
  * re-evaluates the split per element after projection collapse. */
case class WordChunks(child: Expression, n: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(n > 0, s"chunk width must be positive, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val k = words.numElements() / n
    val out = new Array[Any](k)
    var c = 0
    while (c < k) {
      out(c) = WordJoin.join(words, c * n, n)
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** OVERLAPPING n-word windows at stride 1 in document order,
  * duplicates kept — the sliding exact-substring unit ([[WordChunks]]
  * catches only chunk-ALIGNED duplication; a copied span straddling a
  * chunk boundary needs windows at every offset). Positions come from
  * posexplode downstream, so order and repeats are preserved, unlike
  * [[WordShingles]]' distinct set. Single pass per row for the same
  * reason as the other two: slicing a words EXPRESSION once per
  * window re-evaluates the split per element after projection
  * collapse. */
case class WordWindows(child: Expression, n: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(n > 0, s"window width must be positive, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val m = words.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    var i = 0
    while (i < out.length) {
      out(i) = WordJoin.join(words, i, n)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VectorExpressions {
  /** Column wrappers. */
  def dotProduct(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))
  def simhash32(hashes: Column): Column = column(SimHash32(expression(hashes)))
  def minhashSigs(hashes: Column, numPerms: Int, p: Long): Column =
    column(MinHashSigs(expression(hashes), numPerms, p))
  def wordShingles(words: Column, n: Int): Column =
    column(WordShingles(expression(words), n))
  def wordWindows(words: Column, n: Int): Column =
    column(WordWindows(expression(words), n))
  def wordChunks(words: Column, n: Int): Column =
    column(WordChunks(expression(words), n))
}
