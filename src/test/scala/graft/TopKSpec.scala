package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKFunctions.topk_rows
import graft.operators.OlapQueries
import graft.sources.Tables

class TopKSpec extends SparkSpec {

  test("topk_rows equals the window row_number form on orders") {
    val agg = OlapQueries.topOrdersPerCustomerAgg(spark, sf)
      .collect().map(_.toSeq)
    val win = OlapQueries.topOrdersPerCustomer(spark, sf)
      .collect().map(_.toSeq)
    assert(agg.length == win.length)
    agg.zip(win).foreach { case (a, w) => assert(a == w, s"$a != $w") }
  }

  test("topk_rows is partition-invariant (merge correctness)") {
    val base = Tables.load(spark, sf, "orders")
    def run(parts: Int) = base.repartition(parts)
      .groupBy("o_custkey")
      .agg(topk_rows(col("o_totalprice"), col("o_orderkey"),
        struct(col("o_orderkey"), col("o_totalprice")), 3).as("top"))
      .select(col("o_custkey"), col("top"))
      .collect().map(r => (r.getLong(0), r.getSeq[Any](1))).toMap
    assert(run(1) == run(13))
  }

  test("topk_rows handles ties deterministically (smaller tie wins)") {
    import spark.implicits._
    val df = Seq(
      (1L, 10.0, 5L), (1L, 10.0, 2L), (1L, 10.0, 9L), (1L, 3.0, 1L))
      .toDF("g", "ord", "id")
    val top = df.groupBy("g")
      .agg(topk_rows(col("ord"), col("id"), struct(col("id")), 2).as("t"))
      .select(explode(col("t.id")).as("id")).collect().map(_.getLong(0))
    // three ties at ord=10 — the two smallest ids survive, in id order
    assert(top.toSeq == Seq(2L, 5L))
  }

  test("topk_rows: property — matches sort-and-take on seeded random data") {
    import spark.implicits._
    val rng = new scala.util.Random(7L)
    // heavy duplication in both group and ord so ties are common
    val rows = Seq.fill(4000)(
      (rng.nextInt(40).toLong, rng.nextInt(12).toDouble, rng.nextInt(500).toLong))
    val want: Map[Long, Seq[Long]] = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).distinct
        .sortBy { case (ord, id) => (-ord, id) }.take(3).map(_._2)
    }
    // distinct input so the reference's take(3) is well-defined under
    // ties (duplicate (ord,id) rows would make either copy acceptable)
    val got = rows.distinct.toDF("g", "ord", "id")
      .groupBy("g")
      .agg(topk_rows(col("ord"), col("id"), struct(col("id")), 3).as("t"))
      .select(col("g"), col("t.id").as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (g, ids) =>
      assert(ids == want(g), s"group $g: got $ids want ${want(g)}")
    }
  }

  test("q53 plan: partial top-k aggregation, no window, no fact-table sort") {
    val plan = OlapQueries.topOrdersPerCustomerAgg(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"topk_rows should plan as ObjectHashAggregate:\n$plan")
    assert(plan.contains("partial_topk_rows"),
      s"map-side partial aggregation is the whole point:\n$plan")
    assert(!plan.contains("Window"), s"no window expected:\n$plan")
  }
}
