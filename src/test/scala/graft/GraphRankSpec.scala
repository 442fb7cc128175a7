package graft

import org.apache.spark.sql.functions._
import graft.operators.{PageRank, Percentiles}
import graft.sources.Tables

/** PageRank trade graph (q134) and the bottom-k quantile sketch
  * (q133): conservation/floor/determinism invariants for the ranks,
  * and a driver-side selection replica for the sketch (the KmvSpec
  * discipline — recompute the exact sample locally and demand equality).
  */
class GraphRankSpec extends SparkSpec {

  private val P = 1000000007L

  test("trade rank: mass conserved, floor respected, output shape") {
    // topK beyond |V| returns every node — the invariants need them all
    val all = PageRank.tradeRank(spark, sf, iters = 3, topK = 1000000)
      .collect()
    val n = Tables.load(spark, sf, "customer").count() +
      Tables.load(spark, sf, "supplier").count()
    assert(all.length == n)
    val masses = all.map(_.getDouble(2))
    // each 6 dp round can move a rank by ≤ 5e-7; the damped update
    // redistributes everything else, so total mass stays ≈ |V|
    assert(math.abs(masses.sum - n) <= n * 2e-6,
      s"total mass ${masses.sum} vs |V| $n")
    // m = 0.15 + 0.85·(nonneg): the teleport floor survives rounding
    assert(masses.forall(_ >= 0.15 - 1e-9))
    // parity encodes the node type
    assert(all.forall(r => r.getString(1) ==
      (if (r.getLong(0) % 2 == 0) "customer" else "supplier")))
  }

  test("trade rank: deterministic across runs and sorted desc") {
    def run() = PageRank.tradeRank(spark, sf, iters = 2, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val a = run()
    assert(a == run())
    assert(a.map(-_._2).sameElements(a.map(-_._2).sorted))
  }

  test("trade rank: RDD broadcast regime equals the DataFrame big regime") {
    // bound=0 forces the big-graph DataFrame loop on the fixture; the
    // default runs the RDD loop — same 6 dp trajectory, same report
    def rows(bound: Long) =
      PageRank.tradeRank(spark, sf, iters = 3, topK = 50,
          broadcastNodeBound = bound)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows(1000000L) == rows(0L))
  }

  test("trade rank: every iterate sits far from its 6dp rounding boundary") {
    // The two regimes (and the SQL oracle) agree because round(_,6)
    // absorbs summation-order jitter — which holds only while no
    // pre-round value sits within ~1 ulp of an x.5e-6 HALF_UP
    // boundary. Measure it: replicate the exact trajectory on the
    // driver and take the min distance of every (node, iteration)
    // pre-round value to its boundary. Margins must dwarf the ~1e-13
    // cross-partition jitter the scaled-mass calibration targets.
    import org.apache.spark.sql.functions._
    val D = 0.85; val OneMinusD = 0.15
    def round6(x: Double): Double =
      new java.math.BigDecimal(java.lang.Double.toString(x))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def boundaryMargin(x: Double): Double = {
      val y = new java.math.BigDecimal(java.lang.Double.toString(x))
        .movePointRight(6)
      val frac = y.subtract(y.setScale(0, java.math.RoundingMode.FLOOR))
      frac.subtract(new java.math.BigDecimal("0.5")).abs.doubleValue()
    }
    val nodes = (Tables.load(spark, sf, "customer")
        .select((col("c_custkey") * 2L).as("node_id"))
      .unionAll(Tables.load(spark, sf, "supplier")
        .select((col("s_suppkey") * 2L + 1L).as("node_id"))))
      .collect().map(_.getLong(0)).sorted
    val pairs = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2L).as("c"),
        (col("l_suppkey") * 2L + 1L).as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs.flatMap { case (c, s) => Seq((s, c), (c, s)) }
    val deg = edges.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = nodes.length.toLong
    val dangling = nodes.filterNot(deg.contains)
    var rank = nodes.map(_ -> 1.0).toMap
    var dang = dangling.length.toDouble
    var minMargin = Double.MaxValue
    (1 to 3).foreach { _ =>
      val mw = deg.flatMap { case (nid, dg) =>
        rank.get(nid).map(m => nid -> m / dg) }
      val contrib = edges.flatMap { case (dst, src) =>
        mw.get(src).map(dst -> _) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val dangShare = dang / n
      rank = nodes.map { nid =>
        val pre = OneMinusD + D * (contrib.getOrElse(nid, 0.0) + dangShare)
        minMargin = math.min(minMargin, boundaryMargin(pre) * 1e-6)
        nid -> round6(pre)
      }.toMap
      dang = dangling.map(rank).sum
    }
    assert(rank.nonEmpty && minMargin < Double.MaxValue)
    // in VALUE terms: >= 1e-10 of mass, vs ~1e-13 worst-case jitter
    assert(minMargin >= 1e-10,
      f"an iterate sits $minMargin%.2e from its rounding boundary")
    // the margins are only meaningful if this replica IS the engine's
    // trajectory: its report must match bit-for-bit
    val replicaTop = nodes.map(nid => (nid, rank(nid)))
      .sortBy { case (nid, m) => (-m, nid) }.take(20)
      .map { case (nid, m) =>
        (nid, if (nid % 2 == 0) "customer" else "supplier", m) }.toSeq
    val engineTop = PageRank.tradeRank(spark, sf, iters = 3, topK = 20)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq
    assert(replicaTop == engineTop)
  }

  test("trade rank: caches released after the report materializes") {
    // delta, not emptiness: the session is shared across suites and
    // some operators keep session-scoped caches by design
    val before = spark.sparkContext.getPersistentRDDs.keySet
    PageRank.tradeRank(spark, sf, iters = 1, topK = 5).collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"persisted RDDs leaked past tradeRank: $leaked")
  }

  test("sample quantiles: equals the driver-side selection replica") {
    val got = Percentiles.sampleQuantiles(spark, sf, k = 128).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val rows = Tables.load(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"),
        col("l_linenumber"), col("l_extendedprice").cast("double"))
      .collect()
      .map(r => (r.getString(0),
        r.getLong(1) * 10L + r.getInt(2).toLong, r.getDouble(3)))
    val expect = rows.groupBy(_._1).map { case (flag, rs) =>
      val sample = rs
        .map { case (_, rk, v) => (((rk % P) * 2654435761L) % P, rk, v) }
        .sortBy(t => (t._1, t._2)).take(128)
      val byV = sample.map(t => (t._3, t._2)).sortBy(identity)
      val nS = byV.length
      def pick(p: Double) = byV(math.ceil(p * nS).toInt - 1)._1
      flag -> ((nS.toLong, pick(0.50), pick(0.90), pick(0.99)))
    }
    assert(got == expect)
  }

  test("sample quantiles: partition-invariant (mergeable bottom-k)") {
    val once = Percentiles.sampleQuantiles(spark, sf, k = 64).collect()
      .map(_.toSeq).toSeq
    val again = Percentiles.sampleQuantiles(spark, sf, k = 64).collect()
      .map(_.toSeq).toSeq
    assert(once == again)
  }

  test("butterflies: equals a local wedge census") {
    val r = PageRank.butterflyCount(spark, sf).collect()(0)
    val pairs = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct()
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val byCust = pairs.groupBy(_._1).view.mapValues(_.map(_._2).sorted)
    val wedge = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byCust.values.foreach { ss =>
      for (i <- ss.indices; j <- i + 1 until ss.length)
        wedge((ss(i), ss(j))) = wedge.getOrElse((ss(i), ss(j)), 0L) + 1
    }
    assert(r.getLong(0) == pairs.length)
    assert(r.getLong(1) == wedge.values.sum)
    assert(r.getLong(2) == wedge.size)
    assert(r.getLong(3) == wedge.values.map(c => c * (c - 1) / 2).sum)
  }

  test("sortedPairs: every unordered pair exactly once, any size") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, explode}
    for (n <- Seq(0, 1, 2, 3, 7)) {
      val arr = (1 to n).map(_.toLong)
      val got = Seq(Tuple1(arr)).toDF("ss")
        .select(explode(PageRank.sortedPairs(col("ss"))).as("p"))
        .select(col("p.s1"), col("p.s2"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for (i <- arr; j <- arr if i < j) yield (i, j)).toSet
      assert(got == want, s"n=$n")
    }
  }

  test("butterflies: hub-capped census equals the plain plan") {
    import spark.implicits._
    // one synthetic hub (customer 1, degree 60) over a light tail —
    // caps 8 and 16 force ⌈60/8⌉=8 and ⌈60/16⌉=4 chunk splits
    val hub = (1L to 60L).map(s => (1L, s))
    val tail = (2L to 40L).flatMap(c => (1L to 5L).map(k => (c, (c * 7 + k * 13) % 60 + 1)))
    val pairs = (hub ++ tail).distinct.toDF("c", "s")
    val plain = PageRank.butterflyCensusPlan(pairs, hubDegreeCap = 1 << 20)
      .collect()(0).toSeq
    for (cap <- Seq(8, 16)) {
      val capped = PageRank.butterflyCensusPlan(pairs, hubDegreeCap = cap)
        .collect()(0).toSeq
      assert(capped == plain, s"census diverged at cap=$cap")
    }
  }

  test("sample quantiles: estimates bracket the true median loosely") {
    val exact = Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(cast(l_extendedprice as double), " +
        "array(0.3, 0.7))").as("p"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    Percentiles.sampleQuantiles(spark, sf, k = 128).collect().foreach { r =>
      val Seq(lo, hi) = exact(r.getString(0)).toSeq
      val p50 = r.getDouble(2)
      assert(p50 >= lo && p50 <= hi,
        s"${r.getString(0)}: p50_est $p50 outside exact [p30,p70]=[$lo,$hi]")
    }
  }
}
