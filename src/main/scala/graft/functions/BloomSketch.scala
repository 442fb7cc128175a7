package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Bloom-filter bitset over 64-bit keys: the shared kernel behind
  * [[BloomAgg]] (build) and [[BloomMightContain]] (probe).
  *
  * Double hashing (Kirsch–Mitzenmacher): probe i sets/checks bit
  * (h1 + i·h2) mod m, with h1/h2 two independent finalizer-style
  * mixes of the key — k probes from two hashes, the standard
  * construction with the same asymptotic FPR as k independent hashes.
  * No false negatives ever; FPR ≈ (1 − e^{−kn/m})^k.
  */
object BloomKernel {
  /** splitmix64 finalizer — well-mixed, cheap, stateless. */
  def mix1(v: Long): Long = {
    var z = v + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  /** A second, differently-seeded mix for double hashing. */
  def mix2(v: Long): Long = mix1(v ^ 0xA5A5A5A5A5A5A5A5L)

  def set(bits: Array[Long], numBits: Int, numHashes: Int, v: Long): Unit = {
    val h1 = mix1(v); val h2 = mix2(v) | 1L // odd stride
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits).toInt
      bits(bit >>> 6) |= (1L << (bit & 63))
      i += 1
    }
  }

  def contains(bits: Array[Long], numBits: Int, numHashes: Int,
      v: Long): Boolean = {
    val h1 = mix1(v); val h2 = mix2(v) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits).toInt
      if ((bits(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def serialize(bits: Array[Long], numBits: Int, numHashes: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(numBits)
    out.writeInt(numHashes)
    bits.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  /** Returns (bits, numBits, numHashes). */
  def deserialize(bytes: Array[Byte]): (Array[Long], Int, Int) = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val numBits = in.readInt()
    val numHashes = in.readInt()
    val bits = Array.fill((numBits + 63) / 64)(in.readLong())
    (bits, numBits, numHashes)
  }
}

/** `bloom_agg(keys, numBits, numHashes)` — build a Bloom filter over a
  * LONG key column as a native aggregate. The buffer is a fixed
  * numBits-wide bitset; MERGE IS BITWISE OR, so partial (map-side)
  * aggregation holds and the build tree-reduces: at 100 TB each
  * executor folds its partitions into one local bitset and the shuffle
  * moves numBits/8 bytes per partial, independent of row count — the
  * set-membership sibling of the HLL cardinality sketch.
  *
  * Returns the serialized filter (binary); probe with
  * [[BloomMightContain]]. Sizing: FPR ≈ (1−e^{−kn/m})^k — the default
  * call sites use m=2^20, k=7, good to ~1e-5 at n≈50k keys.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(numBits > 0 && numBits % 64 == 0 && numBits <= (1 << 28),
    "numBits must be a positive multiple of 64, at most 2^28")
  require(numHashes > 0 && numHashes <= 16, "numHashes in [1, 16]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg requires a BIGINT key column, got ${other.sql}")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      BloomKernel.set(buf, numBits, numHashes, v.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    BloomKernel.serialize(buf, numBits, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomKernel.serialize(buf, numBits, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomKernel.deserialize(bytes)._1

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** `bloom_might_contain(filterBytes, key)` — probe a serialized Bloom
  * filter. `filterBytes` must be FOLDABLE (a literal: the
  * driver-collected sketch, the standard query-parameter pattern) so
  * the bitset deserializes ONCE per expression instance, not per row;
  * the probe compiles into whole-stage codegen as a single
  * reference-object call (the [[UnaryKernelCodegen]] discipline — no
  * CodegenFallback demotion), so a corpus-side prefilter fuses into
  * the parquet scan. False positives possible (callers verify exactly
  * downstream), false negatives never.
  */
case class BloomMightContain(filter: Expression, key: Expression)
  extends BinaryExpression {

  require(filter.foldable,
    "bloom_might_contain: filter must be a literal (collected sketch)")

  override def left: Expression = filter
  override def right: Expression = key
  override def checkInputDataTypes(): TypeCheckResult =
    (filter.dataType, key.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (f, k) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires (BINARY, BIGINT), got " +
          s"(${f.sql}, ${k.sql})")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val parsed = {
    val bytes = filter.eval(InternalRow.empty).asInstanceOf[Array[Byte]]
    BloomKernel.deserialize(bytes)
  }

  /** Public bridge so generated code can reach the parsed bitset. */
  final def probe(v: Long): Boolean = {
    val (bits, m, k) = parsed
    BloomKernel.contains(bits, m, k, v)
  }

  override def nullSafeEval(f: Any, v: Any): Any = probe(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", this)
    nullSafeCodeGen(ctx, ev, (_, v) => s"${ev.value} = $ref.probe($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(filter = newLeft, key = newRight)
}

object BloomFunctions {
  /** Build a Bloom filter over a long key column (serialized binary). */
  def bloom_agg(c: Column, numBits: Int = 1 << 20,
      numHashes: Int = 7): Column =
    GraftColumnBridge.column(
      BloomAgg(GraftColumnBridge.expression(c), numBits, numHashes)
        .toAggregateExpression())

  /** Probe a (literal) serialized Bloom filter for a long key. */
  def bloom_might_contain(filterBytes: Array[Byte], key: Column): Column =
    GraftColumnBridge.column(BloomMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal
        .create(filterBytes, BinaryType),
      GraftColumnBridge.expression(key)))
}
