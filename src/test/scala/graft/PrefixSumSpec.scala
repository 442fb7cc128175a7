package graft

import org.apache.spark.sql.functions._
import graft.operators.PrefixSum

class PrefixSumSpec extends SparkSpec {

  private def check(keys: Seq[Long], shardWidth: Long): Unit = {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val rows = keys.map(k => (k, rng.nextInt(100).toLong))
    val want = rows.sortBy(_._1).scanLeft(0L)(_ + _._2).tail
    val got = PrefixSum
      .withGlobalCumSum(rows.toDF("k", "x").repartition(7), "k", col("x"),
        "cum", shardWidth)
      .orderBy("k").select("cum").collect().map(_.getLong(0))
    assert(got.sameElements(want))
  }

  test("multi-shard cumsum equals the sequential running sum") {
    check(0L until 1000L, shardWidth = 64) // ~16 shards
  }

  test("sparse, non-dense keys: empty shards contribute nothing") {
    check((0L until 300L).map(_ * 37L + 5L), shardWidth = 256)
  }

  test("single-shard degenerate case") {
    check(0L until 50L, shardWidth = 1L << 20)
  }

  test("withGlobalCumSumAndTotals: shard totals match a driver replica") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = (0L until 500L).map(_ * 3L + 1L).map(k =>
      (k, rng.nextInt(100).toLong))
    val width = 64L
    val (cumDf, totals) = PrefixSum.withGlobalCumSumAndTotals(
      rows.toDF("k", "x").repartition(5), "k", col("x"), "cum", width)
    // totals: one (shard, sum) per non-empty shard, sorted by shard —
    // exactly what a caller deriving per-range offsets on the driver
    // (percentilesByGroupMulti's stripe index) relies on
    val want = rows.groupBy(_._1 / width).view
      .mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    assert(totals == want)
    // and the cumsum half is the same frame withGlobalCumSum returns
    val got = cumDf.orderBy("k").select("cum").collect().map(_.getLong(0))
    val seq = rows.sortBy(_._1).scanLeft(0L)(_ + _._2).tail
    assert(got.sameElements(seq))
  }

  test("null values count as 0 in both passes; reserved names rejected") {
    import spark.implicits._
    val rows = Seq((0L, Some(5L)), (1L, None), (2L, Some(7L)), (3L, None))
    val got = PrefixSum
      .withGlobalCumSum(rows.toDF("k", "x"), "k", col("x"), "cum",
        shardWidth = 2)
      .orderBy("k").select("cum").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(5L, 5L, 12L, 12L))
    intercept[IllegalArgumentException] {
      PrefixSum.withGlobalCumSum(
        Seq((1L, 1L)).toDF("k", "__v"), "k", col("__v"), "cum")
    }
  }
}
