package graft.functions.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary as a native Catalyst aggregate
  * (Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS 2012): at most `k` counters per buffer, single
  * pass, and partial buffers MERGE (map-side combine works — the
  * whole point of expressing the sketch as an aggregate instead of a
  * two-pass groupBy over the raw stream).
  *
  * Guarantee (the one downstream consumers rely on): any item with
  * true count > n/(k+1) is PRESENT in the final summary, and each
  * reported count underestimates its true count by at most n/(k+1)
  * total decrement mass. The summary CONTENT beyond that guarantee
  * depends on merge order, which Spark does not pin — so consumers
  * needing deterministic output must treat the summary as a CANDIDATE
  * set and recount exactly (see TextAnalysis.tHeavyHitters); the
  * aggregate itself is the bounded-memory candidate generator.
  *
  * eval() emits array<struct<word string, cnt long>> sorted
  * (cnt desc, word asc) for stable display. */
case class MisraGries(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, "MisraGries needs at least one counter")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("word", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val w = v.asInstanceOf[UTF8String].toString
      buf.get(w) match {
        case Some(c) => buf(w) = c + 1
        case None if buf.size < k => buf(w) = 1L
        case None =>
          // classic MG step: a full table and a new item decrement
          // every counter; zeros vacate their slots
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { key =>
            val c = buf(key) - 1
            if (c == 0L) dead += key else buf(key) = c
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (w, c) => buf(w) = buf.getOrElse(w, 0L) + c }
    if (buf.size > k) {
      // mergeable-summaries rule: subtract the (k+1)-th largest count
      // from everything; at most k survive and the per-item error
      // bounds add
      val cut = buf.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { key =>
        val c = buf(key) - cut
        if (c <= 0L) dead += key else buf(key) = c
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toSeq.sortBy { case (w, c) => (-c, w) }.map { case (w, c) =>
      InternalRow(UTF8String.fromString(w), c)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (w, c) =>
      val b = w.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf(new String(b, "UTF-8")) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_misra_gries"
}

object SketchAggregates {
  /** Column wrapper: MG summary of a string column, ≤ k counters. */
  def misraGries(c: Column, k: Int): Column =
    column(MisraGries(expression(c), k).toAggregateExpression())
}
