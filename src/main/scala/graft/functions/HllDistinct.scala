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
