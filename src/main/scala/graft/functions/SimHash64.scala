package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `simhash64(array<long>)` — 64-bit SimHash (Charikar 2002) of a set
  * of feature hashes: bit b of the result is 1 iff the majority of
  * input hashes have bit b set. Near-duplicate documents produce
  * signatures within a small Hamming distance, so candidate pairs can
  * be found with equality joins on signature bands instead of O(n²)
  * comparison — the property that makes SimHash dedup tractable at
  * 100 TB.
  *
  * A custom Catalyst Expression (not a UDF): the 64-counter fold over
  * the array is imperative, which column functions express poorly, and
  * an Expression keeps null semantics and avoids serialization of a
  * closure per row. [[UnaryKernelCodegen]] keeps the surrounding
  * stage inside whole-stage codegen — one kernel call per row, the
  * cost is the fold itself, not the dispatch.
  */
case class SimHash64(child: Expression)
  extends UnaryExpression with UnaryKernelCodegen {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<bigint>, got ${other.sql}")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override def prettyName: String = "simhash64"
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHashFunctions {
  /** SimHash signature of an array<long> of feature hashes. */
  def simhash64(c: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(c)))
}
