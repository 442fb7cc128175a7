package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `freq_topk(col, capacity)` — Misra–Gries heavy-hitters summary as a
  * native aggregate: at most `capacity` (value, count) pairs whose
  * counts are within n/capacity of the true frequencies. Counts are
  * EXACT whenever the column's distinct count ≤ capacity (no
  * decrement ever fires) — the regime the oracle checks; the bounded
  * regime is property-tested.
  *
  * Mergeable (sum maps, then subtract the (capacity+1)-th largest
  * count), so partial aggregation holds and the sketch shuffles
  * O(capacity) entries per group — the frequency-side sibling of the
  * HLL cardinality sketch (reference: the hand-measured vocab table,
  * trainer.py:91-118).
  */
case class FreqTopK(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LinkedHashMap[String, Long]]
  with UnaryLike[Expression] {

  require(capacity > 0 && capacity <= 100000, "capacity in [1, 100000]")

  override def createAggregationBuffer(): mutable.LinkedHashMap[String, Long] =
    mutable.LinkedHashMap.empty

  override def update(
      buf: mutable.LinkedHashMap[String, Long],
      input: InternalRow): mutable.LinkedHashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < capacity => buf.update(key, 1L)
        case None => // Misra–Gries decrement-all step
          val dead = mutable.ArrayBuffer[String]()
          buf.keysIterator.foreach { k =>
            val c = buf(k) - 1
            if (c <= 0) dead += k else buf.update(k, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      a: mutable.LinkedHashMap[String, Long],
      b: mutable.LinkedHashMap[String, Long])
      : mutable.LinkedHashMap[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count, drop non-positive
      val counts = a.values.toArray.sorted(Ordering[Long].reverse)
      val d = counts(capacity)
      val dead = mutable.ArrayBuffer[String]()
      a.keysIterator.foreach { k =>
        val c = a(k) - d
        if (c <= 0) dead += k else a.update(k, c)
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.LinkedHashMap[String, Long]): Any = {
    // deterministic output order: count desc, value asc
    val rows = buf.toSeq.sortBy { case (v, c) => (-c, v) }.map {
      case (v, c) => InternalRow(UTF8String.fromString(v), c)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  // length-prefixed raw UTF-8, not writeUTF: writeUTF throws
  // UTFDataFormatException past 65535 bytes, which would crash the
  // shuffle when aggregating over long-string columns (document text)
  override def serialize(buf: mutable.LinkedHashMap[String, Long])
      : Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.LinkedHashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.LinkedHashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.update(
        new String(kb, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", StringType), StructField("cnt", LongType))))
  override def nullable: Boolean = false
  override def prettyName: String = "freq_topk"

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqTopK =
    copy(child = newChild)
}

object FreqFunctions {
  /** Heavy-hitters summary of a string column. */
  def freq_topk(c: Column, capacity: Int): Column =
    GraftColumnBridge.column(
      FreqTopK(GraftColumnBridge.expression(c), capacity)
        .toAggregateExpression())
}
