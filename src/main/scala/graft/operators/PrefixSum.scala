package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix sum (cumulative sum over a total order)
  * without a single-partition window — the two-pass shape:
  *
  *  1. shard by `orderKey div shardWidth` — order-preserving and a
  *     pure function of the data, so the two passes can never disagree
  *     under task retry or recomputation (unlike spark_partition_id);
  *  2. per-shard totals are aggregated (map-side combine ⇒ one row per
  *     shard), collected, prefix-scanned on the driver, and broadcast
  *     back as per-shard offsets;
  *  3. within-shard cumsum via a PARTITION BY shard window — parallel,
  *     one task per shard, no `WindowExec: No Partition Defined`.
  *
  * global_cum(row) = offset(shard(row)) + cum_within_shard(row).
  *
  * The collect is metadata-scale, not data-scale: shard count =
  * keyspace / shardWidth (the same order as RangePartitioner's bound
  * sampling). Size `shardWidth` so a shard fits one task and the shard
  * count stays in the thousands — e.g. 2^20 keys/shard puts a 10^11-row
  * corpus at ~10^5 shards (a few MB on the driver).
  */
object PrefixSum {

  /** Append `outCol` = running sum of `value` over ascending `orderCol`
    * (a unique, non-negative numeric key). Output type is long. NULL
    * `value`s contribute 0 (the window and the shard totals must agree
    * on this, so it is coalesced once, up front).
    */
  def withGlobalCumSum(df: DataFrame, orderCol: String, value: Column,
      outCol: String, shardWidth: Long = 1L << 20): DataFrame =
    withGlobalCumSumAndTotals(df, orderCol, value, outCol, shardWidth)._1

  /** [[withGlobalCumSum]] that ALSO hands back the pass-1 shard totals
    * it collected anyway, sorted by shard id — metadata-scale by the
    * sizing contract above. A caller that needs range totals keyed on
    * the order key (per-stripe counts, per-segment offsets) can derive
    * them on the driver from this list instead of running another
    * aggregate pass over the cumulative frame.
    */
  def withGlobalCumSumAndTotals(df: DataFrame, orderCol: String,
      value: Column, outCol: String, shardWidth: Long = 1L << 20)
      : (DataFrame, Seq[(Long, Long)]) = {
    val reserved = Seq("__shard", "__v", "__off")
    reserved.foreach(c => require(!df.columns.contains(c),
      s"input already has a $c column — rename it before the prefix sum"))
    val spark = df.sparkSession
    val sharded = df
      .withColumn("__shard", expr(s"`$orderCol` div ${shardWidth}L"))
      .withColumn("__v", coalesce(value.cast("long"), lit(0L)))
    // pass 1: one row per shard, collected (tiny — see scaladoc), then
    // exclusive-prefix-scanned into the shard's starting offset
    val totals = sharded.groupBy("__shard").agg(sum("__v").as("__t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var running = 0L
    val offsets = totals.map { case (s, t) =>
      val o = running; running += t; (s, o)
    }.toSeq
    import spark.implicits._
    val offsetsDf = offsets.toDF("__shard", "__off")
    // pass 2: partitioned window — each shard is one independent cumsum
    val w = Window.partitionBy("__shard").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = sharded
      .join(broadcast(offsetsDf), Seq("__shard"))
      .withColumn(outCol, col("__off") + sum("__v").over(w))
      .drop("__shard", "__v", "__off")
    (out, totals.toSeq)
  }
}
