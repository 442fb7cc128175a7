package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** The mergeable bottom-k QUANTILE sketch family — the KMV sibling
  * that carries a VALUE payload per retained hash, so per-group
  * nearest-rank quantile estimates come from a uniform
  * without-replacement row sample (the one-pass machinery of
  * [[graft.operators.Percentiles.sampleQuantiles]], packaged as a
  * storable summary measure; reference anchor: the percentile
  * reporting the host warehouse serves over its MVs, trainer.py's
  * evaluation summaries).
  *
  * State: the k smallest DISTINCT (priority, value) pairs, priority =
  * an engine-portable hash of the row's unique key (uniform on
  * [0, domain)), value = the measured quantity as a scaled LONG
  * (the caller scales, e.g. price×100 — integers are the only
  * cross-engine-exact payload). Bottom-k by (priority, value) is a
  * mergeable summary: the k smallest pairs of a union lie in the
  * union of the per-part k smallest, so
  *
  *   sketch(A ∪ B) = truncate_k(sketch(A) ∪ sketch(B))
  *
  * EXACTLY — per-grain stored sketches re-aggregate to the
  * whole-table sketch bit-for-bit, which is what lets approximate
  * percentiles route through a summary whose grain does NOT contain
  * the value column (the histogram grains of q179/q180 explode when
  * the value domain is near-unique; this is the standard warehouse
  * answer). Estimates are nearest-rank over the value-sorted sample
  * (rank error O(n/√k)); selection is pure compare-and-pick, no
  * interpolation arithmetic, so given the portable hash the entire
  * sketch — membership AND estimate — replays in plain SQL
  * (`SELECT DISTINCT pri, v ORDER BY pri, v LIMIT k`, then
  * `row_number() OVER (ORDER BY v, pri)`).
  *
  * At 100 TB: one corpus scan, ≤ k pairs per group per map task into
  * the shuffle (partial aggregation holds), O(k·groups) total state —
  * the same bounded-state contract as the HLL/KMV/Bloom siblings.
  */
private[functions] object QskOps {

  type Buf = mutable.TreeSet[(Long, Long)]

  def empty: Buf = mutable.TreeSet.empty[(Long, Long)]

  def insert(buf: Buf, pri: Long, v: Long, k: Int): Unit = {
    if (buf.size < k) buf.add((pri, v))
    else if (Ordering[(Long, Long)].lt((pri, v), buf.last) &&
        buf.add((pri, v)))
      buf.remove(buf.last)
  }

  /** Nearest-rank selection over the value-sorted sample: the value
    * at row ceil(p·m) of the m ≤ k retained pairs ordered by
    * (value, priority). Null when the sample is empty.
    */
  def select(buf: Buf, p: Double): Any =
    if (buf.isEmpty) null
    else {
      val byValue = buf.toArray.sortBy { case (pri, v) => (v, pri) }
      val idx = math.ceil(p * byValue.length).toLong
        .max(1L).min(byValue.length.toLong).toInt
      byValue(idx - 1)._2
    }

  def toArrayData(buf: Buf): GenericArrayData = {
    val out = new Array[Long](buf.size * 2)
    var i = 0
    buf.foreach { case (pri, v) =>
      out(i) = pri; out(i + 1) = v; i += 2
    }
    new GenericArrayData(out)
  }

  def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (pri, v) => out.writeLong(pri); out.writeLong(v) }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = empty
    (0 until n).foreach(_ => buf.add((in.readLong(), in.readLong())))
    buf
  }

  def checkInputs(pri: Expression, value: Expression, fn: String)
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (pri.dataType, value.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case (p, v) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"$fn requires (BIGINT priority hash, BIGINT scaled " +
              s"value), got (${p.sql}, ${v.sql})")
    }
}

/** `quantile_sketch_agg(pri, value, k)` — the sketch STATE over raw
  * rows: a flat `array<bigint>` of the retained pairs interleaved
  * `[pri₀, v₀, pri₁, v₁, …]` in (pri, value) order — the storable
  * summary-measure form (parquet-friendly, SQL-replayable).
  */
case class QskSketchAgg(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QskOps.Buf]
  with BinaryLike[Expression] {

  require(k > 1 && k <= 65536, "k in [2, 65536]")

  override def createAggregationBuffer(): QskOps.Buf = QskOps.empty

  override def update(buf: QskOps.Buf, input: InternalRow): QskOps.Buf = {
    val p = left.eval(input)
    val v = right.eval(input)
    if (p != null && v != null)
      QskOps.insert(buf, p.asInstanceOf[Long], v.asInstanceOf[Long], k)
    buf
  }

  override def merge(a: QskOps.Buf, b: QskOps.Buf): QskOps.Buf = {
    b.foreach { case (p, v) => QskOps.insert(a, p, v, k) }
    a
  }

  override def eval(buf: QskOps.Buf): Any = QskOps.toArrayData(buf)

  override def serialize(buf: QskOps.Buf): Array[Byte] =
    QskOps.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QskOps.Buf =
    QskOps.deserialize(bytes)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "quantile_sketch_agg"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    QskOps.checkInputs(left, right, prettyName)

  override def withNewMutableAggBufferOffset(n: Int): QskSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): QskSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): QskSketchAgg =
    copy(left = l, right = r)
}

/** `quantile_sketch_est(pri, value, k, p)` — the query-side aggregate:
  * the nearest-rank p-quantile estimate (BIGINT, the scaled value)
  * straight off the raw rows. This is the spelling the MV router
  * rewrites: over a summary carrying the matching declared
  * (pri, value) sketch measure, it becomes [[QskUnion]] of the stored
  * per-grain states — bit-identical by the exact merge property.
  */
case class QskQuantile(
    left: Expression,
    right: Expression,
    k: Int,
    p: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QskOps.Buf]
  with BinaryLike[Expression] {

  require(k > 1 && k <= 65536, "k in [2, 65536]")
  require(p > 0.0 && p <= 1.0, "p in (0, 1]")

  override def createAggregationBuffer(): QskOps.Buf = QskOps.empty

  override def update(buf: QskOps.Buf, input: InternalRow): QskOps.Buf = {
    val pr = left.eval(input)
    val v = right.eval(input)
    if (pr != null && v != null)
      QskOps.insert(buf, pr.asInstanceOf[Long], v.asInstanceOf[Long], k)
    buf
  }

  override def merge(a: QskOps.Buf, b: QskOps.Buf): QskOps.Buf = {
    b.foreach { case (pr, v) => QskOps.insert(a, pr, v, k) }
    a
  }

  override def eval(buf: QskOps.Buf): Any = QskOps.select(buf, p)

  override def serialize(buf: QskOps.Buf): Array[Byte] =
    QskOps.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QskOps.Buf =
    QskOps.deserialize(bytes)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true // empty sample: no estimate
  override def prettyName: String = "quantile_sketch_est"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    QskOps.checkInputs(left, right, prettyName)

  override def withNewMutableAggBufferOffset(n: Int): QskQuantile =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): QskQuantile =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): QskQuantile =
    copy(left = l, right = r)
}

/** `quantile_sketch_union(sketch, k, p[, asEstimate])` — re-aggregates
  * stored sketch arrays ([[QskSketchAgg]]'s output) by pair-set union
  * + re-truncation. eval returns the merged ESTIMATE (what a routed
  * [[QskQuantile]] becomes) or the merged SKETCH array (what a
  * summary refresh stores for the next generation).
  */
case class QskUnion(
    child: Expression,
    k: Int,
    p: Double = 0.5,
    asEstimate: Boolean = true,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QskOps.Buf]
  with UnaryLike[Expression] {

  require(k > 1 && k <= 65536, "k in [2, 65536]")
  require(p > 0.0 && p <= 1.0, "p in (0, 1]")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"quantile_sketch_union requires array<bigint> (an " +
              s"interleaved bottom-k state), got ${other.sql}")
    }

  override def createAggregationBuffer(): QskOps.Buf = QskOps.empty

  override def update(buf: QskOps.Buf, input: InternalRow): QskOps.Buf = {
    val a = child.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() % 2 == 0,
        "quantile_sketch_union: odd-length state array")
      var i = 0
      while (i < arr.numElements()) {
        QskOps.insert(buf, arr.getLong(i), arr.getLong(i + 1), k)
        i += 2
      }
    }
    buf
  }

  override def merge(a: QskOps.Buf, b: QskOps.Buf): QskOps.Buf = {
    b.foreach { case (pr, v) => QskOps.insert(a, pr, v, k) }
    a
  }

  override def eval(buf: QskOps.Buf): Any =
    if (asEstimate) QskOps.select(buf, p) else QskOps.toArrayData(buf)

  override def serialize(buf: QskOps.Buf): Array[Byte] =
    QskOps.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QskOps.Buf =
    QskOps.deserialize(bytes)

  override def dataType: DataType =
    if (asEstimate) LongType else ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = asEstimate
  override def prettyName: String = "quantile_sketch_union"

  override def withNewMutableAggBufferOffset(n: Int): QskUnion =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): QskUnion =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): QskUnion =
    copy(child = c)
}

object QskFunctions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftColumnBridge

  /** Nearest-rank p-quantile estimate off raw rows (the routable
    * spelling). `pri` = portable hash of the unique row key, uniform
    * on [0, domain); `value` = the quantity as a scaled BIGINT. */
  def quantile_sketch_est(pri: Column, value: Column, k: Int,
      p: Double): Column =
    GraftColumnBridge.column(QskQuantile(
      GraftColumnBridge.expression(pri),
      GraftColumnBridge.expression(value), k, p).toAggregateExpression())

  /** The storable sketch state (array<bigint>, interleaved pairs). */
  def quantile_sketch_agg(pri: Column, value: Column, k: Int): Column =
    GraftColumnBridge.column(QskSketchAgg(
      GraftColumnBridge.expression(pri),
      GraftColumnBridge.expression(value), k).toAggregateExpression())

  /** Merge stored states; estimate (default) or merged state. */
  def quantile_sketch_union(sketch: Column, k: Int, p: Double = 0.5,
      asEstimate: Boolean = true): Column =
    GraftColumnBridge.column(QskUnion(
      GraftColumnBridge.expression(sketch), k, p, asEstimate)
      .toAggregateExpression())
}
