package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout
import graft.sources.Tables

class LayoutSpec extends SparkSpec {

  /** Reference Morton interleave, independently written. */
  private def morton(x: Long, y: Long): Long =
    (0 until 16).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  test("zorderKey equals the reference interleave on real keys") {
    val rows = Tables.load(spark, sf, "orders")
      .select(
        col("o_custkey").bitwiseAND(lit(65535L)).as("x"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
          .bitwiseAND(lit(65535L)).as("y"))
      .withColumn("z", Layout.zorderKey(col("x"), col("y")))
      .limit(500).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == morton(r.getLong(0), r.getLong(1)),
        s"zorder mismatch at (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("zorderKey is invertible (distinct inputs -> distinct keys)") {
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val keys = pts.map { case (x, y) => morton(x, y) }
    assert(keys.distinct.size == pts.size)
  }

  test("manifest buckets are tight boxes covering every row") {
    // bucketShift=18 on a 32-bit key fixes the top 7 bits of BOTH
    // dimensions, so a bucket's bounding box spans < 2^9 per dim —
    // the geometric fact that turns min/max stats into file pruning
    val m = Layout.zorderManifest(spark, sf).collect()
    assert(m.nonEmpty)
    val total = m.map(_.getLong(1)).sum
    assert(total == Tables.load(spark, sf, "orders").count())
    m.foreach { b =>
      assert(b.getLong(3) - b.getLong(2) <= 511L,
        s"custkey span too wide in bucket ${b.getLong(0)}")
      assert(b.getLong(5) - b.getLong(4) <= 511L,
        s"day span too wide in bucket ${b.getLong(0)}")
    }
    // bucket ids are distinct (one manifest row per bucket)
    val ids = m.map(_.getLong(0))
    assert(ids.distinct.length == ids.length)
  }
}
