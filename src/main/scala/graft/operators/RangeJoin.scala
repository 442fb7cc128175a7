package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Range (interval-containment) join — `fact.v ∈ [lo, hi)` against an
  * interval table — without a BroadcastNestedLoopJoin.
  *
  * Spark plans a bare non-equi join as BNLJ (broadcastable only while
  * the interval side is tiny, O(n·m) compares regardless). The grid
  * trick reduces it to an equality join: intervals explode into the
  * fixed-width grid cells they cover, facts compute their cell with
  * one `floor`, the join key is the cell, and the original predicate
  * re-checks exactly inside the matched cell. Same shape as the LSH
  * band joins: bucket → equality join → exact verify. Works at any
  * interval-table size (it is a plain shuffle join on the cell key),
  * and the explode factor is bounded by interval width / grid.
  */
object RangeJoin {

  /** Join `facts` to `intervals` on `lo ≤ value < hi` via grid cells
    * of width `grid`. `intervals` must carry `lo` and `hi` columns.
    */
  def bucketed(facts: DataFrame, intervals: DataFrame, value: Column,
      grid: Double): DataFrame = {
    require(grid > 0, "grid width must be positive")
    // every grid cell the interval [lo, hi) overlaps; hi is exclusive,
    // so an interval ending exactly on a cell boundary stops short
    val cells = intervals.withColumn("__cell",
      explode(sequence(
        floor(col("lo") / grid).cast("long"),
        floor((col("hi") - lit(1e-9)) / grid).cast("long"))))
    facts
      .withColumn("__cell", floor(value / grid).cast("long"))
      .join(cells, Seq("__cell"))
      .filter(value >= col("lo") && value < col("hi"))
      .drop("__cell")
  }

  /** q59: classify events into skew-shaped value bands (literal
    * interval table, non-uniform widths — the case plain arithmetic
    * bucketing can't express) and aggregate per band. The oracle
    * replays the naive BETWEEN join; the Spark plan is the bucketed
    * equality join — plan-asserted BNLJ-free.
    */
  def eventValueBands(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bands = ValueBands.toDF("band_id", "lo", "hi")
    bucketed(Tables.load(spark, sfDir, "events"), bands, col("value"),
        grid = 16.0)
      .groupBy("band_id")
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total_value"))
      .orderBy("band_id")
  }

  /** Exponential-ish value bands mirroring the right-skewed `value`
    * distribution (uniform bands would put ~all rows in band 0).
    */
  val ValueBands: Seq[(Long, Double, Double)] = Seq(
    (0L, 0.0, 1.0), (1L, 1.0, 2.0), (2L, 2.0, 5.0), (3L, 5.0, 10.0),
    (4L, 10.0, 20.0), (5L, 20.0, 50.0), (6L, 50.0, 100.0),
    (7L, 100.0, 200.0), (8L, 200.0, 500.0))
}
