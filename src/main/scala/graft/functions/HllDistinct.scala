package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** `hll_distinct(col)` — approximate distinct count as a native
  * Catalyst aggregate over a mergeable HLL sketch buffer.
  *
  * This is the "custom cardinality estimator plugin" north star: the
  * distributed form of the reference's hand-maintained per-column
  * `vocab_size` table (trainer.py:91-118). TypedImperativeAggregate
  * gives partial/final aggregation for free — each task builds a
  * 16 KiB sketch, shuffle moves sketches (not rows), merge is an
  * elementwise max. On a 100 TB scan the answer costs one pass and
  * O(16 KiB × groups) of network.
  *
  * Input values are hashed with xxHash64 over their Catalyst internal
  * representation, so any atomic input type works.
  */
case class HllDistinct(
    child: Expression,
    precision: Int = HllSketch.DefaultPrecision,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(precision >= 4 && precision <= 18, "precision must be in [4,18]")

  override def createAggregationBuffer(): Array[Byte] =
    HllSketch.emptyRegisters(precision)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      HllSketch.add(buffer, XxHash64Function.hash(v, child.dataType, 42L))
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    HllSketch.merge(buffer, other)

  override def eval(buffer: Array[Byte]): Any = HllSketch.estimate(buffer)

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllDistinct =
    copy(child = newChild)
}

/** `hll_sketch_agg(col[, p])` — the MERGEABLE SKETCH ITSELF (the
  * register array, BinaryType) instead of its estimate: the storable
  * form a summary table keeps per grain row, so approximate distinct
  * counts stay re-aggregable across rollups and refresh generations
  * (register-max is associative — merged-then-estimated equals
  * estimated-over-everything BIT-exactly).
  */
case class HllSketchAgg(
    child: Expression,
    precision: Int = HllSketch.DefaultPrecision,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(precision >= 4 && precision <= 18, "precision must be in [4,18]")

  override def createAggregationBuffer(): Array[Byte] =
    HllSketch.emptyRegisters(precision)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      HllSketch.add(buffer, XxHash64Function.hash(v, child.dataType, 42L))
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    HllSketch.merge(buffer, other)

  override def eval(buffer: Array[Byte]): Any = buffer

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType =
    org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_sketch_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): HllSketchAgg = copy(child = newChild)
}

/** `hll_union(sketch[, asEstimate])` — aggregates SERIALIZED sketches
  * (hll_sketch_agg's output) by elementwise register max. eval
  * returns the merged ESTIMATE (LongType, `asEstimate = true` — what
  * a routed `hll_distinct` becomes) or the merged SKETCH (BinaryType
  * — what a summary refresh stores for the next generation). An empty
  * group yields 0 / null respectively, matching hll_distinct over no
  * rows.
  */
case class HllUnion(
    child: Expression,
    asEstimate: Boolean = true,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  // misuse fails at ANALYSIS (like kmv_ndv), not as an executor-side
  // ClassCastException mid-job
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"hll_union requires binary (a serialized sketch), " +
              s"got ${other.sql}")
    }

  // the buffer starts EMPTY (precision unknown until the first input
  // sketch arrives); merge/update adopt the first non-empty registers
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  private def fold(buffer: Array[Byte], v: Array[Byte]): Array[Byte] =
    if (v == null || v.isEmpty) buffer
    else if (buffer.isEmpty) v.clone()
    else {
      require(buffer.length == v.length,
        s"sketch precision mismatch: ${buffer.length} vs ${v.length}")
      HllSketch.merge(buffer, v)
    }

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] =
    fold(buffer, child.eval(input).asInstanceOf[Array[Byte]])

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    fold(buffer, other)

  override def eval(buffer: Array[Byte]): Any =
    if (asEstimate) { if (buffer.isEmpty) 0L else HllSketch.estimate(buffer) }
    else { if (buffer.isEmpty) null else buffer }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType =
    if (asEstimate) LongType else org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = !asEstimate
  override def prettyName: String = "hll_union"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllUnion =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllUnion =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): HllUnion = copy(child = newChild)
}

/** Column-API helpers for the sketch functions. */
object HllFunctions {
  import org.apache.spark.sql.GraftColumnBridge

  private def expr(c: Column): Expression = GraftColumnBridge.expression(c)

  /** Approximate distinct count of `c` (default precision, ~0.8% err). */
  def hll_distinct(c: Column): Column =
    GraftColumnBridge.column(HllDistinct(expr(c)).toAggregateExpression())

  def hll_distinct(c: Column, precision: Int): Column =
    GraftColumnBridge.column(
      HllDistinct(expr(c), precision).toAggregateExpression())
}
