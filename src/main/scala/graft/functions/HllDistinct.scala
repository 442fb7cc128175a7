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

/** `hll_ndv_portable(h[, p])` — the PORTABLE-hash HLL: approximate
  * distinct count over values ALREADY hashed into
  * [0, [[HllSketch.PortableDomain]]) by the engine's replayable
  * integer hash family (see [[HllFunctions.portableHash]]). Unlike
  * [[HllDistinct]] (xxHash64 over Catalyst internals — no other
  * engine can rebuild its registers), every bit of this sketch is
  * pure integer arithmetic on the caller-visible hash, so a SQL
  * oracle rebuilds register array AND estimate exactly (q21's
  * DuckDB replay; the q174 KMV / q128 Count-Min discipline applied
  * to HLL). Same mergeable register-max algebra, same one-pass /
  * O(2^p)-state scale story; accuracy holds to ~10^6 NDV (the ~2^30
  * hash domain's ceiling) — use [[HllDistinct]] beyond that.
  *
  * Out-of-range input (an unhashed value) fails loudly: silently
  * folding it in would produce estimates no oracle can reproduce.
  */
case class HllPortableNdv(
    child: Expression,
    precision: Int = HllSketch.PortablePrecision,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(precision >= 4 && precision <= 18, "precision must be in [4,18]")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            "hll_ndv_portable requires a long PRE-HASHED into " +
              s"[0, ${HllSketch.PortableDomain}), got ${other.sql}")
    }

  override def createAggregationBuffer(): Array[Byte] =
    HllSketch.emptyRegisters(precision)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (h < 0 || h >= HllSketch.PortableDomain)
        throw new IllegalArgumentException(
          s"hll_ndv_portable input $h outside [0, " +
            s"${HllSketch.PortableDomain}) — hash with the portable " +
            "integer discipline first (e.g. HllFunctions.portableHash)")
      HllSketch.addPortable(buffer, h)
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    HllSketch.merge(buffer, other)

  override def eval(buffer: Array[Byte]): Any =
    HllSketch.estimatePortable(buffer)

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_ndv_portable"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllPortableNdv =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllPortableNdv =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): HllPortableNdv = copy(child = newChild)
}

/** Column-API helpers for the sketch functions. */
object HllFunctions {
  import org.apache.spark.sql.GraftColumnBridge
  import org.apache.spark.sql.functions.{lit, shiftright}

  private def expr(c: Column): Expression = GraftColumnBridge.expression(c)

  /** Approximate distinct count of `c` (default precision, ~0.8% err). */
  def hll_distinct(c: Column): Column =
    GraftColumnBridge.column(HllDistinct(expr(c)).toAggregateExpression())

  def hll_distinct(c: Column, precision: Int): Column =
    GraftColumnBridge.column(
      HllDistinct(expr(c), precision).toAggregateExpression())

  /** The portable NDV sketch over a pre-hashed long column. */
  def hll_ndv_portable(c: Column): Column =
    GraftColumnBridge.column(
      HllPortableNdv(expr(c)).toAggregateExpression())

  def hll_ndv_portable(c: Column, precision: Int): Column =
    GraftColumnBridge.column(
      HllPortableNdv(expr(c), precision).toAggregateExpression())

  /** The portable MIX: affine + xorshift rounds mod 1e9+7, every op
    * integer-exact and SQL-replayable (`xor(h, h >> 13)` etc. in
    * DuckDB). Two multiplicative rounds separated by xorshifts break
    * the arithmetic-progression structure a single affine leaves on
    * sequential keys — a structure HLL's max-rank statistics are
    * sensitive to (single-affine measured +24–37% on TPC-H keys; this
    * mix lands within the standard ±1.04/√m band). Products stay
    * below 2^61, so JVM longs and ANSI engines agree. Input: any
    * non-negative integral column (apply `poly_fingerprint` first for
    * strings); output ∈ [0, PortableDomain).
    */
  def portableHash(v: Column): Column = {
    val P = lit(HllSketch.PortableDomain)
    val h1 = (v % P) * lit(2654435761L) % P
    val h2 = h1.bitwiseXOR(shiftright(h1, 13))
    val h3 = h2 * lit(1610612741L) % P
    h3.bitwiseXOR(shiftright(h3, 11)) % P
  }
}
