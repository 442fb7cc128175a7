package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** `kmv_ndv(hash, k[, domain])` — K-Minimum-Values distinct-count
  * sketch (Bar-Yossef et al. 2002; the theta-sketch family's simplest
  * member): keep the k smallest DISTINCT hash values seen; if fewer
  * than k exist the count is exact, otherwise estimate
  * NDV ≈ (k−1)·domain / h_(k) from the k-th smallest hash. The
  * cardinality-statistics sibling of [[HllDistinct]] (reference
  * anchor: the hand-maintained vocab_size table, trainer.py:91-118)
  * with one property HLL lacks: given a deterministic engine-portable
  * hash, the ENTIRE sketch state — the k values themselves — is
  * replayable in plain SQL (`row_number() ... ORDER BY h`), so the
  * estimate hash-compares across engines, integer-exact.
  *
  * Mergeable (set-union, re-truncate to k): partial aggregation holds,
  * each map task shuffles ≤ k longs per group, and the union of two
  * sketches is the sketch of the union — the same bounded-state
  * contract as the HLL/Bloom/Misra–Gries/Count-Min siblings. Insertion
  * keeps a sorted set, so update is O(log k) with early exit when the
  * value exceeds the current k-th minimum.
  *
  * The input must already be the hash (a LONG uniform on [0, domain)):
  * hashing stays in the query where the oracle can replay it. NULLs
  * are ignored; values outside [0, domain) are rejected at runtime —
  * a wrong domain silently biases the estimate, so it fails loudly.
  */
case class KmvNdv(
    child: Expression,
    k: Int,
    domain: Long = 1000000007L,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]]
  with UnaryLike[Expression] {

  require(k > 1 && k <= 65536, "k in [2, 65536]")
  require(domain > 1, "domain must be positive")

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty

  private def insert(buf: mutable.TreeSet[Long], h: Long): Unit = {
    if (h < 0 || h >= domain)
      throw new IllegalArgumentException(
        s"kmv_ndv: hash $h outside [0, $domain)")
    if (buf.size < k) buf.add(h)
    else if (h < buf.last && buf.add(h)) buf.remove(buf.last)
  }

  override def update(
      buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      a: mutable.TreeSet[Long], b: mutable.TreeSet[Long])
      : mutable.TreeSet[Long] = {
    b.foreach(insert(a, _))
    a
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    if (buf.size < k) buf.size.toLong
    else {
      val kth = buf.last
      // kth == 0 needs k distinct values below 0 — impossible; guarded
      // so a future domain change can never divide by zero
      if (kth == 0L) buf.size.toLong
      else (k - 1).toLong * domain / kth // floor division, positive args
    }

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeSet.empty[Long]
    (0 until n).foreach(_ => buf.add(in.readLong()))
    buf
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_ndv"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kmv_ndv requires a BIGINT hash column, got ${other.sql}")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvNdv =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvNdv =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvNdv =
    copy(child = newChild)
}

object KmvFunctions {
  /** KMV distinct estimate of a pre-hashed LONG column. */
  def kmv_ndv(hash: Column, k: Int,
      domain: Long = 1000000007L): Column =
    GraftColumnBridge.column(
      KmvNdv(GraftColumnBridge.expression(hash), k, domain)
        .toAggregateExpression())
}
