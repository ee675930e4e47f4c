package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.expr.{DotProduct, MinHashSigs, MisraGries, SimHash32, WordChunks, WordShingles, WordWindows}

/** Session extension registering graft's custom Catalyst expressions
  * as SQL functions, so `spark.sql("SELECT graft_dot(a, b) ...")`
  * reaches the same codegen'd implementations as the Scala API.
  *
  * Activate at session build time
  * (`SparkSession.builder.withExtensions(new GraftExtensions)`) or on
  * a live session via [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _)  => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be a long literal, got $other")
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("graft_simhash32",
      new ExpressionInfo(classOf[SimHash32].getName, "graft_simhash32"),
      (es: Seq[Expression]) => SimHash32(es(0))),
    ("graft_minhash_sigs",
      new ExpressionInfo(classOf[MinHashSigs].getName, "graft_minhash_sigs"),
      (es: Seq[Expression]) => MinHashSigs(es(0),
        intArg(es(1), "numPerms"), longArg(es(2), "p"))),
    ("graft_word_shingles",
      new ExpressionInfo(classOf[WordShingles].getName, "graft_word_shingles"),
      (es: Seq[Expression]) => WordShingles(es(0), intArg(es(1), "n"))),
    ("graft_word_chunks",
      new ExpressionInfo(classOf[WordChunks].getName, "graft_word_chunks"),
      (es: Seq[Expression]) => WordChunks(es(0), intArg(es(1), "n"))),
    ("graft_word_windows",
      new ExpressionInfo(classOf[WordWindows].getName, "graft_word_windows"),
      (es: Seq[Expression]) => WordWindows(es(0), intArg(es(1), "n"))),
    // an AggregateFunction builder: the analyzer wraps it in an
    // AggregateExpression like any built-in aggregate
    ("graft_misra_gries",
      new ExpressionInfo(classOf[MisraGries].getName, "graft_misra_gries"),
      (es: Seq[Expression]) => MisraGries(es(0), intArg(es(1), "k"))),
  )

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
