package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `topk_rows(ord, tie, payload, k)` — per-group top-k as a bounded
  * aggregate: keeps the k payload rows with the greatest `ord`
  * (ties broken by the smallest `tie`), emitted best-first.
  *
  * The composable spelling — `row_number() over (partition by g order
  * by ord desc) <= k` — shuffles and sorts EVERY row of the group. As
  * a TypedImperativeAggregate the top-k participates in partial
  * aggregation: each map task reduces its slice to ≤ k rows per group
  * before the exchange, so the shuffle carries O(k · groups) rows
  * instead of the whole table, and no sort ever runs. At 100 TB with
  * k=3 and rows-per-key in the thousands, that is the difference
  * between shuffling the fact table and shuffling its keys.
  *
  * Buffer: a k-bounded min-heap ordered worst-first ((ord asc, tie
  * desc)), so admission is O(log k) against the current worst.
  */
case class TopKRows(
    first: Expression,   // ord: double, descending preference
    second: Expression,  // tie: long, ascending preference
    third: Expression,   // payload: struct, copied into the buffer
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[TopKRows.Entry]]
  with TernaryLike[Expression] {

  require(k > 0 && k <= 100000, "k in [1, 100000]")

  private def payloadSchema: StructType =
    third.dataType.asInstanceOf[StructType]

  @transient private lazy val toUnsafe = UnsafeProjection.create(payloadSchema)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (DoubleType, LongType, _: StructType) =>
        TypeCheckResult.TypeCheckSuccess
      case (f, s, t) => TypeCheckResult.TypeCheckFailure(
        s"topk_rows requires (double, long, struct), got " +
          s"${f.sql}, ${s.sql}, ${t.sql}")
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[TopKRows.Entry] =
    mutable.PriorityQueue.empty(TopKRows.worstFirst)

  private def admit(buf: mutable.PriorityQueue[TopKRows.Entry],
      e: TopKRows.Entry): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else {
      val worst = buf.head
      val better = e.ord > worst.ord ||
        (e.ord == worst.ord && e.tie < worst.tie)
      if (better) { buf.dequeue(); buf.enqueue(e) }
    }
  }

  override def update(buf: mutable.PriorityQueue[TopKRows.Entry],
      input: InternalRow): mutable.PriorityQueue[TopKRows.Entry] = {
    val o = first.eval(input)
    val t = second.eval(input)
    val p = third.eval(input)
    if (o != null && t != null && p != null) {
      // copy: the unsafe row handed to eval is a reused buffer
      val row = toUnsafe(p.asInstanceOf[InternalRow]).copy()
      admit(buf, TopKRows.Entry(o.asInstanceOf[Double],
        t.asInstanceOf[Long], row))
    }
    buf
  }

  override def merge(a: mutable.PriorityQueue[TopKRows.Entry],
      b: mutable.PriorityQueue[TopKRows.Entry])
      : mutable.PriorityQueue[TopKRows.Entry] = {
    b.foreach(admit(a, _))
    a
  }

  override def eval(buf: mutable.PriorityQueue[TopKRows.Entry]): Any = {
    val best = buf.toArray.sortBy(e => (-e.ord, e.tie))
    new GenericArrayData(best.map(_.row).toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[TopKRows.Entry])
      : Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { e =>
      out.writeDouble(e.ord)
      out.writeLong(e.tie)
      val bytes = e.row.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.PriorityQueue[TopKRows.Entry] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val ord = in.readDouble()
      val tie = in.readLong()
      val rb = new Array[Byte](in.readInt())
      in.readFully(rb)
      val row = new UnsafeRow(payloadSchema.length)
      row.pointTo(rb, rb.length)
      buf.enqueue(TopKRows.Entry(ord, tie, row))
    }
    buf
  }

  override def dataType: DataType = ArrayType(payloadSchema)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_rows"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): TopKRows =
    copy(first = f, second = s, third = t)
}

object TopKRows {
  /** One retained row: sort key, tie-break, owned payload copy. */
  case class Entry(ord: Double, tie: Long, row: UnsafeRow)

  /** Max-heap ordering that surfaces the WORST entry at the head —
    * smallest ord, then largest tie — so eviction is O(log k).
    */
  val worstFirst: Ordering[Entry] = new Ordering[Entry] {
    def compare(a: Entry, b: Entry): Int = {
      val c = java.lang.Double.compare(b.ord, a.ord)
      if (c != 0) c else java.lang.Long.compare(a.tie, b.tie)
    }
  }
}

object TopKFunctions {
  /** Top `k` payload rows per group by `ord` desc (ties: `tie` asc). */
  def topk_rows(ord: Column, tie: Column, payload: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKRows(GraftColumnBridge.expression(ord),
        GraftColumnBridge.expression(tie),
        GraftColumnBridge.expression(payload), k).toAggregateExpression())
}
