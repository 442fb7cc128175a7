package graft

import org.apache.spark.sql.functions._
import graft.functions.KmvFunctions.kmv_ndv
import graft.plans.CardinalityEstimator

/** KMV distinct-count sketch (q132): exact below k, estimate formula
  * replayed locally, set-semantics (duplicates are free), partition
  * invariance (merge correctness), SQL registration, and the loud
  * domain guard.
  */
class KmvSpec extends SparkSpec {

  private val P = 1000000007L

  private def hash(v: Long): Long = ((v % P) * 2654435761L) % P

  private def estOf(values: Seq[Long], k: Int): Long = {
    import spark.implicits._
    values.map(hash).toDF("h")
      .agg(kmv_ndv(col("h"), k, P)).collect()(0).getLong(0)
  }

  test("exact count below k, including duplicates") {
    val vals = (1L to 50L) ++ (1L to 50L) ++ (1L to 50L)
    assert(estOf(vals, 128) == 50L)
  }

  test("estimate matches the local k-th order-statistic replica") {
    val n = 5000
    val hashes = (1L to n).map(hash).distinct.sorted
    val k = 256
    val kth = hashes(k - 1)
    val expected = (k - 1).toLong * P / kth
    assert(estOf(1L to n, k) == expected)
    // accuracy: |est − n| within ~2/sqrt(k) relative on this fixed set
    assert(math.abs(expected - n) < n * 2.0 / math.sqrt(k.toDouble),
      s"est $expected vs true $n")
  }

  test("duplicates never move the estimate (set semantics)") {
    val base = 1L to 3000L
    assert(estOf(base, 128) == estOf(base ++ base ++ base.map(identity), 128))
  }

  test("partition invariance: merge path equals single-partition path") {
    import spark.implicits._
    val df = (1L to 4000L).map(hash).toDF("h")
    def run(parts: Int) = df.repartition(parts)
      .agg(kmv_ndv(col("h"), 128, P)).collect()(0).getLong(0)
    assert(run(1) == run(13))
  }

  test("SQL registration: kmv_ndv from spark.sql equals the Column form") {
    import spark.implicits._
    (1L to 2000L).map(hash).toDF("h").createOrReplaceTempView("kmv_in")
    val viaSql = spark.sql(
      s"SELECT kmv_ndv(h, 128, ${P}L) AS e FROM kmv_in")
      .collect()(0).getLong(0)
    assert(viaSql == estOf(1L to 2000L, 128))
  }

  test("hash outside the domain fails loudly, not silently") {
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq(-1L).toDF("h").agg(kmv_ndv(col("h"), 8, P)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("q132 kmvVocabTable: exact branch below k, estimates above") {
    val rows = CardinalityEstimator.kmvVocabTable(spark, sf)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.map(_._1) ==
      Seq("l_orderkey", "l_partkey", "l_suppkey"))
    rows.foreach { case (name, exact, est) =>
      if (exact < 128) assert(est == exact, s"$name must be exact")
      else assert(math.abs(est - exact) < exact * 0.25,
        s"$name est $est too far from $exact")
    }
  }
}
