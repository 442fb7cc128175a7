package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-layout clustering: Z-order (Morton) keys and the file-level
  * min/max manifest that makes them pay off. At 100 TB the scan cost
  * of a selective two-dimensional predicate is decided before the
  * query runs — by how the writer clustered the files. Sorting by a
  * bit-interleaved key gives every file a tight bounding box in BOTH
  * dimensions, so a reader holding the min/max manifest (parquet
  * row-group stats, table-format data-skipping indexes) prunes all
  * files outside the query box instead of scanning one well-clustered
  * dimension and the full range of the other.
  */
object Layout {

  /** Morton code over the low `bits` of two non-negative longs: bit i
    * of `x` lands at position 2i, bit i of `y` at 2i+1. Pure column
    * arithmetic (shift/and/or) — whole-stage-codegen'd, no UDF, and
    * replayable verbatim by any SQL engine. 16+16 bits keeps the key
    * in 32 bits; production layouts range-partition on this key at
    * write time.
    */
  def zorderKey(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** The data-skipping manifest a Z-ordered write of `orders` would
    * carry: cluster on zorder(custkey, order-day), split the key space
    * into fixed-width buckets (stand-ins for files — `bucketShift`=18
    * ⇒ up to 16384 buckets of a 32-bit key), and record each bucket's row
    * count and per-dimension min/max. Because a bucket is a contiguous
    * Morton range, its top bits fix the top bits of BOTH dimensions:
    * every bucket's bounding box spans < 2^9 in each — the geometric
    * fact [[LayoutSpec]] asserts and a query box turns into pruned
    * buckets. The aggregation is one scan + one NDV-sized shuffle;
    * nothing here is corpus-ordered.
    */
  def zorderManifest(spark: SparkSession, sfDir: String,
      bucketShift: Int = 18): DataFrame = {
    val x = col("o_custkey").bitwiseAND(lit(65535L))
    val y = datediff(col("o_orderdate"), lit("1970-01-01"))
      .cast("long").bitwiseAND(lit(65535L))
    Tables.load(spark, sfDir, "orders")
      .select(x.as("ck"), y.as("day"),
        zorderKey(x, y).as("zkey"))
      .groupBy(shiftright(col("zkey"), bucketShift).as("z_bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("ck")).as("min_ck"), max(col("ck")).as("max_ck"),
        min(col("day")).as("min_day"), max(col("day")).as("max_day"))
      .orderBy("z_bucket")
  }
}
