package graft

import org.apache.spark.sql.functions._
import graft.operators.{OlapQueries, Percentiles, Pipeline}
import graft.sources.Tables

/** Batch-3 round-3 additions: the distributed exact-percentile path
  * (q96) against the collect-list form it replaces (q35), the
  * manifest MERGE (q94), and the ranking-window suite (q95).
  */
class PercentileMergeSpec extends SparkSpec {

  test("q96 distributed percentiles ≡ the percentile() aggregate") {
    val exact = Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
        round(expr("percentile(l_quantity, 0.95)"), 4).as("p95_qty"),
        round(expr("percentile(l_discount, 0.5)"), 4).as("p50_disc"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    val dist = Percentiles.quantityPercentilesDistributed(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(dist.toSeq == exact.toSeq)
  }

  test("price measure (near-unique fixed-point) ≡ q35's price exactly") {
    // the crossover case: cents NDV ~ rows at test scale — slower
    // there by design, but still exact (the bench query uses
    // bounded-NDV measures; this proves the general path)
    val exact = OlapQueries.quantityPercentiles(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val dist = Percentiles.percentilesByGroupMulti(
      Tables.load(spark, sf, "lineitem"), "l_returnflag",
      Seq(Percentiles.Measure("price", col("l_extendedprice"), 100L,
        Seq("p50_price" -> 0.5))))
      .collect()
      .map(r => r.getString(0) ->
        BigDecimal(r.getDouble(2)).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    assert(dist == exact)
  }

  test("q96 plan: no collect_list state, every window partitioned") {
    val df = Percentiles.quantityPercentilesDistributed(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("percentile"),
      s"distributed path must not fall back to percentile():\n$plan")
    // every WindowExec must be partitioned (the sharded prefix sum's
    // per-shard windows) — a corpus-ordered global window is the
    // defect this operator exists to avoid
    val windows = plan.linesIterator.filter(_.contains("Window "))
    windows.foreach(w => assert(!w.contains("windowspecdefinition()"),
      s"unpartitioned window:\n$w"))
  }

  test("percentilesByGroup handles single-row and two-row groups") {
    import spark.implicits._
    val df = Seq(("a", 10.0), ("b", 1.0), ("b", 2.0)).toDF("g", "x")
    val got = Percentiles.percentilesByGroup(df, "g", col("x"), 1L,
        Seq("p50" -> 0.5, "p95" -> 0.95))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2))).toSet
    // a: single row → both targets are the value; b: p50 of (1,2) =
    // 1.5, p95 = 1 + 0.95*(2-1)
    assert(got == Set(("a", "p50", 10.0), ("a", "p95", 10.0),
      ("b", "p50", 1.5), ("b", "p95", 1.95)))
  }

  test("q94 mergeManifest matches a naive recomputation") {
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val existingSrcs = (0 to 9).map(i => s"src$i").toSet
    def manifest(side: Array[(Long, String, String)]) =
      side.groupBy(_._2).map { case (t, g) =>
        t -> (g.map(_._1).min, g.length.toLong)
      }
    val e = manifest(docs.filter(d => existingSrcs(d._3)))
    val b = manifest(docs.filter(d => !existingSrcs(d._3)))
    val expected = (e.keySet ++ b.keySet).map { t =>
      val (oldO, newO) = (e.get(t), b.get(t))
      val id = oldO.map(_._1).getOrElse(newO.get._1)
      val action =
        if (newO.isEmpty) "keep" else if (oldO.isEmpty) "insert"
        else "update"
      (id, action,
        oldO.map(_._2).getOrElse(0L) + newO.map(_._2).getOrElse(0L))
    }
    val got = Pipeline.mergeManifest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.exists(_._2 == "insert") && got.exists(_._2 == "keep"),
      "fixture should exercise both keep and insert")
  }

  test("q95 windowSuite ranking functions match a naive recomputation") {
    val events = Tables.load(spark, sf, "events")
      .select("user_id", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byUser = events.groupBy(_._1).view
      .mapValues(_.sortBy(_._2)).toMap
    val got = OlapQueries.windowSuite(spark, sf).collect()
    got.foreach { r =>
      val (u, e) = (r.getLong(0), r.getLong(1))
      val part = byUser(u)
      val n = part.length
      val i = part.indexWhere(_._2 == e) // 0-based rank (ties impossible)
      // ntile: first (n mod 4) buckets get ceil(n/4)
      val (q, rem) = (n / 4, n % 4)
      val quartile =
        if (i < rem * (q + 1)) i / (q + 1) + 1
        else rem + (i - rem * (q + 1)) / math.max(q, 1) + 1
      assert(r.getInt(3) == quartile, s"ntile user $u event $e")
      val pr = if (n == 1) 0.0 else i.toDouble / (n - 1)
      assert(math.abs(r.getDouble(4) - pr) < 5.1e-5, s"pct_rank $u/$e")
      val cd = (i + 1).toDouble / n
      assert(math.abs(r.getDouble(5) - cd) < 5.1e-5, s"cume_dist $u/$e")
      val next = if (i + 1 < n) Some(part(i + 1)._3) else None
      assert(Option(r.get(6)).map(_.asInstanceOf[Double]) == next)
      assert(r.getDouble(7) == part.head._3, s"first_value $u/$e")
      val third = if (n >= 3) Some(part(2)._3) else None
      assert(Option(r.get(8)).map(_.asInstanceOf[Double]) == third)
    }
    assert(got.length == events.length)
  }

  test("selection narrowing loop: multi-round ranges (fanout < sqrt(domain))") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // values 0..3999 near-unique; fanout 16 forces width0 = 250 > 16,
    // so every probe narrows through an extra histogram round before
    // the final value pass — the loop the default 4096 fanout never
    // enters below a 2^24 domain. Results must be fanout-invariant
    // and match the percentile() spelling exactly.
    val df = (0L until 4000L).map(v => ("g", v)).toDF("g", "__q_m")
    val m = Percentiles.Measure("m", col("__q_m").cast("double"), 1L,
      Seq("p10" -> 0.10, "p50" -> 0.50, "p99" -> 0.99))
    def run(fanout: Int) =
      Percentiles.selectionPercentiles(df, "g",
        Seq(Percentiles.SelItem(m, "__q_m", 3999L)), fanout = fanout)
        .map { case (_, t, r) => t -> r }.toMap
    val narrow = run(16)
    assert(narrow == run(4096))
    val list = Percentiles.valueListPercentiles(df, "g", Seq(m))
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(narrow.keySet == list.keySet)
    for ((t, v) <- narrow)
      assert(math.abs(v - list(t)) < 1e-9, s"$t: $v vs ${list(t)}")
  }
}
