package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.plans.{Summaries, SummaryRewrite}
import graft.sources.Tables

/** Randomized shape sweep over the MV router — the component where a
  * silent wrong answer is worst ("wrong answers beat saved scans").
  * For a fixed summary, every combination drawn from a seeded RNG of
  * (grouping subset, grain filter, aggregate mix) must produce a
  * routed answer IDENTICAL to the force-unrouted one. The property is
  * stronger than the targeted specs: it exercises the gate and the
  * rewrite jointly — shapes that legally route must be value-exact,
  * and shapes that fall through must still be correct (raw).
  */
class SummaryPropertySpec extends SparkSpec {

  private def withoutRouting[A](body: => A): A = {
    spark.conf.set(SummaryRewrite.ConfKey, "false")
    try body finally spark.conf.unset(SummaryRewrite.ConfKey)
  }

  private def cmp(q: () => DataFrame, label: String): Unit = {
    val routed = q().collect().toSeq
    val raw = withoutRouting { q().collect().toSeq }
    assert(routed == raw, s"$label diverged:\n$routed\nvs\n$raw")
  }

  test("random grouping/filter/aggregate shapes: routed == raw") {
    val rnd = new scala.util.Random(20260815L)
    Summaries.create(
      Tables.load(spark, sf, "lineitem"), "prop_sum",
      grain = Seq("l_returnflag", "l_linestatus", "l_quantity"),
      sums = Seq(
        "s_price" -> "cast(l_extendedprice as decimal(18,2))",
        "s_disc" -> "cast(l_discount as decimal(18,2))"),
      sumsqs = Seq("sq_disc" -> "cast(l_discount as decimal(18,2))"),
      mins = Seq("mn_price" -> "l_extendedprice"),
      maxs = Seq("mx_price" -> "l_extendedprice"))
    try {
      val grain = Seq("l_returnflag", "l_linestatus", "l_quantity")
      import graft.functions.ExactMomentsFunctions._
      val decDisc = col("l_discount").cast("decimal(18,2)")
      val aggPool: Seq[(String, Column)] = Seq(
        "cnt" -> count(lit(1)),
        "cq" -> count(col("l_quantity")),
        "ndq" -> countDistinct(col("l_quantity")),
        "p50" -> expr("percentile(l_quantity, 0.5)"),
        "p9" -> expr("percentile(l_quantity + 1, 0.9)"),
        "mnq" -> min(col("l_quantity")),
        "mxq" -> max(col("l_quantity")),
        "sp" -> sum(col("l_extendedprice").cast("decimal(18,2)")),
        "ap" -> avg(col("l_extendedprice").cast("decimal(18,2)")),
        "mnp" -> min(col("l_extendedprice")),
        "mxp" -> max(col("l_extendedprice")),
        // exact moments: route via the declared sumsq leg
        "vse" -> var_samp_exact(decDisc),
        "vpe" -> var_pop_exact(decDisc),
        "sde" -> stddev_samp_exact(decDisc),
        // shapes that must NOT route — correctness still required
        "st" -> sum(col("l_tax")),
        "ad" -> avg(col("l_extendedprice")), // double avg: never routes
        // exact moments WITHOUT a declared sumsq (price): stay raw
        "vsp" -> var_samp_exact(col("l_extendedprice")
          .cast("decimal(18,2)")),
        "sq" -> sum(col("l_quantity")))
      val filterPool: Seq[Column] = Seq(
        col("l_returnflag") =!= "N",
        col("l_quantity") > 25.0,
        col("l_linestatus") === "F",
        col("l_quantity") % 2 === 0)
      for (i <- 1 to 24) {
        val groups = rnd.shuffle(grain).take(rnd.nextInt(grain.size + 1))
        val picked = rnd.shuffle(aggPool).take(1 + rnd.nextInt(4))
        val aggs = picked.map { case (n, c) => c.as(n) }
        val filters = rnd.shuffle(filterPool).take(rnd.nextInt(3))
        val q = () => {
          val base = filters.foldLeft(
            Tables.load(spark, sf, "lineitem"))(_ filter _)
          val agged =
            if (groups.isEmpty) base.agg(aggs.head, aggs.tail: _*)
            else base.groupBy(groups.map(col): _*)
              .agg(aggs.head, aggs.tail: _*)
          // deterministic order for the row-list compare
          agged.orderBy(groups.map(col) :+ col(picked.head._1): _*)
        }
        cmp(q, s"shape $i (groups=$groups filters=${filters.size} " +
          s"aggs=${picked.map(_._1)})")
      }
    } finally Summaries.drop("prop_sum")
  }

  test("random ROLLUP/CUBE shapes: routed == raw") {
    val rnd = new scala.util.Random(181L)
    Summaries.create(
      Tables.load(spark, sf, "lineitem"), "prop_rollup",
      grain = Seq("l_returnflag", "l_linestatus", "l_quantity"),
      sums = Seq("s_price" -> "cast(l_extendedprice as decimal(18,2))"),
      mins = Seq("mn_price" -> "l_extendedprice"))
    try {
      val grain = Seq("l_returnflag", "l_linestatus", "l_quantity")
      val aggPool: Seq[(String, Column)] = Seq(
        "cnt" -> count(lit(1)),
        "p50" -> expr("percentile(l_quantity, 0.5)"),
        "ndq" -> countDistinct(col("l_quantity")),
        "mnq" -> min(col("l_quantity")),
        "sp" -> sum(col("l_extendedprice").cast("decimal(18,2)")),
        "ap" -> avg(col("l_extendedprice").cast("decimal(18,2)")),
        "mnp" -> min(col("l_extendedprice")),
        // must fall through to raw — still has to be correct
        "st" -> sum(col("l_tax")))
      val filterPool: Seq[Column] = Seq(
        col("l_returnflag") =!= "N",
        col("l_quantity") > 25.0)
      for (i <- 1 to 16) {
        val dims = rnd.shuffle(grain).take(1 + rnd.nextInt(grain.size))
        val picked = rnd.shuffle(aggPool).take(1 + rnd.nextInt(3))
        val aggs = picked.map { case (n, c) => c.as(n) }
        val filters = rnd.shuffle(filterPool).take(rnd.nextInt(2))
        val cube = rnd.nextBoolean()
        val q = () => {
          val base = filters.foldLeft(
            Tables.load(spark, sf, "lineitem"))(_ filter _)
          val grouped = if (cube) base.cube(dims.map(col): _*)
            else base.rollup(dims.map(col): _*)
          grouped.agg(aggs.head, aggs.tail: _*)
            .orderBy(dims.map(col) :+ col(picked.head._1): _*)
        }
        // null grouping markers sort fine inside Spark; the compare
        // here is row-set equality of collected Rows
        val routed = q().collect().toSeq.toSet
        val raw = withoutRouting { q().collect().toSeq.toSet }
        assert(routed == raw,
          s"rollup shape $i (dims=$dims cube=$cube filters=" +
            s"${filters.size} aggs=${picked.map(_._1)}) diverged:\n" +
            s"${routed.diff(raw)}\nvs missing\n${raw.diff(routed)}")
      }
    } finally Summaries.drop("prop_rollup")
  }

  test("random shapes against a DELTA-COMPENSATED summary: routed == raw") {
    // same shape sweep as the single-table property, but the summary
    // is STALE-BUT-APPEND-ONLY: the source copy gained 20% of its rows
    // as new files after the build, so every routed answer goes
    // through merge(summary, partial-agg(delta)) — the compensated
    // substrate must be value-exact across the whole measure family,
    // and fall-through shapes must still be correct (raw)
    import scala.jdk.CollectionConverters._
    val rnd = new scala.util.Random(11082026L)
    val dir = java.nio.file.Files.createTempDirectory("graft_prop_delta")
      .toFile
    val srcPath = new java.io.File(dir, "li_copy").getAbsolutePath
    val li = Tables.load(spark, sf, "lineitem")
    li.filter(col("l_orderkey") % 10 < 8).write.parquet(srcPath)
    Summaries.create(
      spark.read.parquet(srcPath), "prop_delta",
      grain = Seq("l_returnflag", "l_linestatus", "l_quantity"),
      sums = Seq(
        "s_price" -> "cast(l_extendedprice as decimal(18,2))",
        "s_disc" -> "cast(l_discount as decimal(18,2))"),
      sumsqs = Seq("sq_disc" -> "cast(l_discount as decimal(18,2))"),
      mins = Seq("mn_price" -> "l_extendedprice"),
      maxs = Seq("mx_price" -> "l_extendedprice"),
      // a quantile-sketch measure rides the same delta compensation:
      // merge(stored sketches, sketch(delta rows)) must equal the
      // post-append raw sketch for every shape that draws "qsk"
      qsks = Seq("qsk_price" ->
        (graft.operators.OlapQueries.QskPriSql,
          graft.operators.OlapQueries.QskValSql)), qskK = 128)
    li.filter(col("l_orderkey") % 10 >= 8)
      .write.mode("append").parquet(srcPath)
    Summaries.invalidate("prop_delta")
    try {
      val grain = Seq("l_returnflag", "l_linestatus", "l_quantity")
      import graft.functions.ExactMomentsFunctions._
      val decDisc = col("l_discount").cast("decimal(18,2)")
      val aggPool: Seq[(String, Column)] = Seq(
        "cnt" -> count(lit(1)),
        "cq" -> count(col("l_quantity")),
        "ndq" -> countDistinct(col("l_quantity")),
        "p50" -> expr("percentile(l_quantity, 0.5)"),
        "mnq" -> min(col("l_quantity")),
        "mxq" -> max(col("l_quantity")),
        "sp" -> sum(col("l_extendedprice").cast("decimal(18,2)")),
        "ap" -> avg(col("l_extendedprice").cast("decimal(18,2)")),
        "mnp" -> min(col("l_extendedprice")),
        "mxp" -> max(col("l_extendedprice")),
        "vse" -> var_samp_exact(decDisc),
        "sde" -> stddev_samp_exact(decDisc),
        "qsk" -> graft.functions.QskFunctions.quantile_sketch_est(
          expr(graft.operators.OlapQueries.QskPriSql),
          expr(graft.operators.OlapQueries.QskValSql), 128, 0.9),
        // fall-through shapes: correctness still required
        "st" -> sum(col("l_tax")),
        "ad" -> avg(col("l_extendedprice")),
        "sq" -> sum(col("l_quantity")))
      val filterPool: Seq[Column] = Seq(
        col("l_returnflag") =!= "N",
        col("l_quantity") > 25.0,
        col("l_linestatus") === "F")
      for (i <- 1 to 20) {
        val groups = rnd.shuffle(grain).take(rnd.nextInt(grain.size + 1))
        val picked = rnd.shuffle(aggPool).take(1 + rnd.nextInt(4))
        val aggs = picked.map { case (n, c) => c.as(n) }
        val filters = rnd.shuffle(filterPool).take(rnd.nextInt(3))
        val q = () => {
          val base = filters.foldLeft(spark.read.parquet(srcPath))(
            _ filter _)
          val agged =
            if (groups.isEmpty) base.agg(aggs.head, aggs.tail: _*)
            else base.groupBy(groups.map(col): _*)
              .agg(aggs.head, aggs.tail: _*)
          agged.orderBy(groups.map(col) :+ col(picked.head._1): _*)
        }
        cmp(q, s"delta shape $i (groups=$groups " +
          s"filters=${filters.size} aggs=${picked.map(_._1)})")
      }
    } finally {
      Summaries.drop("prop_delta")
      java.nio.file.Files.walk(dir.toPath).iterator().asScala.toSeq
        .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("random shapes against a DELETE-COMPENSATED summary: " +
      "routed == raw") {
    // the retention twin of the delta arm: the source LOSES a built
    // file after the build, so routable shapes go through
    // merge(summary, negate(cube rows of the deleted file)) — the
    // invertible family (count / sum / avg legs / grain-only
    // percentile / distinct / integral grain sums) must be
    // value-exact, and the pruned family (declared min/max, sketches)
    // must fall through to raw and still be correct
    import scala.jdk.CollectionConverters._
    val rnd = new scala.util.Random(12082026L)
    val dir = java.nio.file.Files.createTempDirectory("graft_prop_del")
      .toFile
    val srcPath = new java.io.File(dir, "li_copy").getAbsolutePath
    val li = Tables.load(spark, sf, "lineitem")
    li.filter(col("l_orderkey") % 10 < 8).write.parquet(srcPath)
    def files() = new java.io.File(srcPath).listFiles()
      .filter(f => !f.getName.startsWith("_") &&
        !f.getName.startsWith(".")).map(_.getName).toSet
    val before = files()
    li.filter(col("l_orderkey") % 10 >= 8)
      .coalesce(1).write.mode("append").parquet(srcPath)
    val doomed = (files() -- before).head
    Summaries.create(
      spark.read.parquet(srcPath), "prop_del",
      grain = Seq("l_returnflag", "l_linestatus", "l_quantity"),
      sums = Seq(
        "s_price" -> "cast(l_extendedprice as decimal(18,2))",
        "s_disc" -> "cast(l_discount as decimal(18,2))"),
      sumsqs = Seq("sq_disc" -> "cast(l_discount as decimal(18,2))"),
      mins = Seq("mn_price" -> "l_extendedprice"),
      maxs = Seq("mx_price" -> "l_extendedprice"))
    assert(new java.io.File(srcPath, doomed).delete())
    Summaries.invalidate("prop_del")
    try {
      val grain = Seq("l_returnflag", "l_linestatus", "l_quantity")
      import graft.functions.ExactMomentsFunctions._
      val decDisc = col("l_discount").cast("decimal(18,2)")
      val aggPool: Seq[(String, Column)] = Seq(
        "cnt" -> count(lit(1)),
        "cq" -> count(col("l_quantity")),
        "ndq" -> countDistinct(col("l_quantity")),
        "p50" -> expr("percentile(l_quantity, 0.5)"),
        "mnq" -> min(col("l_quantity")),
        "mxq" -> max(col("l_quantity")),
        "sp" -> sum(col("l_extendedprice").cast("decimal(18,2)")),
        "ap" -> avg(col("l_extendedprice").cast("decimal(18,2)")),
        // exact moments ride the sumsq SUM legs — invertible, routes
        "vse" -> var_samp_exact(decDisc),
        "sde" -> stddev_samp_exact(decDisc),
        // pruned under delete compensation: fall through, stay right
        "mnp" -> min(col("l_extendedprice")),
        "mxp" -> max(col("l_extendedprice")),
        "st" -> sum(col("l_tax")),
        "ad" -> avg(col("l_extendedprice")),
        "sq" -> sum(col("l_quantity")))
      val filterPool: Seq[Column] = Seq(
        col("l_returnflag") =!= "N",
        col("l_quantity") > 25.0,
        col("l_linestatus") === "F")
      for (i <- 1 to 20) {
        val groups = rnd.shuffle(grain).take(rnd.nextInt(grain.size + 1))
        val picked = rnd.shuffle(aggPool).take(1 + rnd.nextInt(4))
        val aggs = picked.map { case (n, c) => c.as(n) }
        val filters = rnd.shuffle(filterPool).take(rnd.nextInt(3))
        val q = () => {
          val base = filters.foldLeft(spark.read.parquet(srcPath))(
            _ filter _)
          val agged =
            if (groups.isEmpty) base.agg(aggs.head, aggs.tail: _*)
            else base.groupBy(groups.map(col): _*)
              .agg(aggs.head, aggs.tail: _*)
          agged.orderBy(groups.map(col) :+ col(picked.head._1): _*)
        }
        cmp(q, s"delete shape $i (groups=$groups " +
          s"filters=${filters.size} aggs=${picked.map(_._1)})")
      }
      // MIXED tail: an append lands on top of the delete — the
      // compensation becomes summary − cube(missing) + Δpartial,
      // and the same shape sweep must stay value-exact
      li.filter(col("l_orderkey") % 10 === 9 &&
          col("l_linenumber") === 1)
        .coalesce(1).write.mode("append").parquet(srcPath)
      Summaries.invalidate("prop_del")
      for (i <- 1 to 8) {
        val groups = rnd.shuffle(grain).take(rnd.nextInt(grain.size + 1))
        val picked = rnd.shuffle(aggPool).take(1 + rnd.nextInt(4))
        val aggs = picked.map { case (n, c) => c.as(n) }
        val filters = rnd.shuffle(filterPool).take(rnd.nextInt(3))
        val q = () => {
          val base = filters.foldLeft(spark.read.parquet(srcPath))(
            _ filter _)
          val agged =
            if (groups.isEmpty) base.agg(aggs.head, aggs.tail: _*)
            else base.groupBy(groups.map(col): _*)
              .agg(aggs.head, aggs.tail: _*)
          agged.orderBy(groups.map(col) :+ col(picked.head._1): _*)
        }
        cmp(q, s"mixed shape $i (groups=$groups " +
          s"filters=${filters.size} aggs=${picked.map(_._1)})")
      }
    } finally {
      Summaries.drop("prop_del")
      java.nio.file.Files.walk(dir.toPath).iterator().asScala.toSeq
        .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("random shapes against the JOINED summary: routed == raw") {
    val rnd = new scala.util.Random(8152026L)
    val li = Tables.load(spark, sf, "lineitem")
    val ord = Tables.load(spark, sf, "orders")
    Summaries.createJoined(
      li.join(ord, li("l_orderkey") === ord("o_orderkey")),
      "prop_join",
      grain = Seq("o_orderpriority", "l_returnflag", "l_quantity"),
      sums = Seq("s_price" -> "cast(l_extendedprice as decimal(18,2))"))
    try {
      val grain = Seq("o_orderpriority", "l_returnflag", "l_quantity")
      val aggPool: Seq[(String, Column)] = Seq(
        "cnt" -> count(lit(1)),
        "p50" -> expr("percentile(l_quantity, 0.5)"),
        "mxq" -> max(col("l_quantity")),
        "sp" -> sum(col("l_extendedprice").cast("decimal(18,2)")),
        "ap" -> avg(col("l_extendedprice").cast("decimal(18,2)")),
        "ndf" -> countDistinct(col("l_returnflag")),
        // non-routable: a non-grain, non-measure column
        "mnt" -> min(col("l_tax")),
        "ad" -> avg(col("l_extendedprice"))) // double avg: never routes
      val filterPool: Seq[Column] = Seq(
        col("o_orderpriority") =!= "1-URGENT",
        col("l_quantity") <= 40.0,
        col("l_returnflag") =!= "R")
      for (i <- 1 to 16) {
        val groups = rnd.shuffle(grain).take(rnd.nextInt(grain.size + 1))
        val picked = rnd.shuffle(aggPool).take(1 + rnd.nextInt(3))
        val aggs = picked.map { case (n, c) => c.as(n) }
        val filters = rnd.shuffle(filterPool).take(rnd.nextInt(3))
        val q = () => {
          val base = filters.foldLeft(
            Tables.load(spark, sf, "lineitem")
              .join(Tables.load(spark, sf, "orders"),
                col("l_orderkey") === col("o_orderkey")))(_ filter _)
          val agged =
            if (groups.isEmpty) base.agg(aggs.head, aggs.tail: _*)
            else base.groupBy(groups.map(col): _*)
              .agg(aggs.head, aggs.tail: _*)
          agged.orderBy(groups.map(col) :+ col(picked.head._1): _*)
        }
        cmp(q, s"join shape $i (groups=$groups " +
          s"filters=${filters.size} aggs=${picked.map(_._1)})")
      }
    } finally Summaries.drop("prop_join")
  }

  test("random shapes against a FILTERED summary: routed == raw " +
      "whether or not the shape subsumes the declaration") {
    // the filtered-MV property: a summary declared WHERE l_quantity
    // > 30 must serve subsuming shapes value-exactly and leave every
    // other shape on the raw table — cmp() checks routed == raw
    // either way, so a subsumption false-positive (routing a
    // non-subsumed shape onto the slice) surfaces as a value diff
    val rnd = new scala.util.Random(30082026L)
    val li = Tables.load(spark, sf, "lineitem")
    Summaries.create(li, "prop_filtered",
      grain = Seq("l_returnflag", "l_linestatus", "l_quantity"),
      sums = Seq("sp" -> "cast(l_extendedprice as decimal(18,2))"),
      mins = Seq("mnp" -> "l_extendedprice"),
      where = Some("l_quantity > 30"))
    try {
      val grain = Seq("l_returnflag", "l_linestatus", "l_quantity")
      val aggPool: Seq[(String, Column)] = Seq(
        "cnt" -> count(lit(1)),
        "sp" -> sum(col("l_extendedprice").cast("decimal(18,2)")),
        "ap" -> avg(col("l_extendedprice").cast("decimal(18,2)")),
        "mnp" -> min(col("l_extendedprice")),
        "mxq" -> max(col("l_quantity")))
      // a mix of subsuming (> 30, > 40, = 45-with->30) and
      // non-subsuming (>= 30, > 25, no quantity filter) shapes
      val filterPool: Seq[Column] = Seq(
        col("l_quantity") > 30.0,
        col("l_quantity") > 40.0,
        col("l_quantity") >= 30.0,
        col("l_quantity") > 25.0,
        col("l_returnflag") =!= "N")
      for (i <- 1 to 16) {
        val groups = rnd.shuffle(grain).take(rnd.nextInt(grain.size + 1))
        val picked = rnd.shuffle(aggPool).take(1 + rnd.nextInt(3))
        val aggs = picked.map { case (n, c) => c.as(n) }
        val filters = rnd.shuffle(filterPool).take(rnd.nextInt(3))
        val q = () => {
          val base = filters.foldLeft(
            Tables.load(spark, sf, "lineitem"))(_ filter _)
          val agged =
            if (groups.isEmpty) base.agg(aggs.head, aggs.tail: _*)
            else base.groupBy(groups.map(col): _*)
              .agg(aggs.head, aggs.tail: _*)
          agged.orderBy(groups.map(col) :+ col(picked.head._1): _*)
        }
        cmp(q, s"filtered shape $i (groups=$groups " +
          s"filters=${filters.size} aggs=${picked.map(_._1)})")
      }
    } finally Summaries.drop("prop_filtered")
  }

  test("random shapes against a TWO-LEAF delta-compensated JOINED " +
      "summary: routed == raw") {
    // the round-11 telescoped fold under the same shape sweep: BOTH
    // leaves gain appended files after the build, so every routed
    // answer goes through merge(summary, partial-agg(Δli⋈ord₀ ∪
    // (li₀+Δli)⋈Δord)) — the cross-delta terms must count every pair
    // of raw rows exactly once across the whole measure family, and
    // fall-through shapes must still be correct (raw)
    import scala.jdk.CollectionConverters._
    val rnd = new scala.util.Random(16082026L)
    val dir = java.nio.file.Files.createTempDirectory("graft_prop_j2")
      .toFile
    val liPath = new java.io.File(dir, "li_copy").getAbsolutePath
    val ordPath = new java.io.File(dir, "ord_copy").getAbsolutePath
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_returnflag", "l_quantity",
        "l_extendedprice", "l_tax")
    val ord = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_orderpriority")
    li.filter(col("l_orderkey") % 10 < 8).write.parquet(liPath)
    ord.filter(col("o_orderkey") % 10 =!= 3).write.parquet(ordPath)
    val src = () => spark.read.parquet(liPath)
      .join(spark.read.parquet(ordPath),
        col("l_orderkey") === col("o_orderkey"))
    Summaries.createJoined(src(), "prop_j2",
      grain = Seq("o_orderpriority", "l_returnflag", "l_quantity"),
      sums = Seq("s_price" -> "cast(l_extendedprice as decimal(18,2))"))
    li.filter(col("l_orderkey") % 10 >= 8)
      .write.mode("append").parquet(liPath)
    ord.filter(col("o_orderkey") % 10 === 3)
      .write.mode("append").parquet(ordPath)
    Summaries.invalidate("prop_j2")
    try {
      val grain = Seq("o_orderpriority", "l_returnflag", "l_quantity")
      val aggPool: Seq[(String, Column)] = Seq(
        "cnt" -> count(lit(1)),
        "p50" -> expr("percentile(l_quantity, 0.5)"),
        "mxq" -> max(col("l_quantity")),
        "sp" -> sum(col("l_extendedprice").cast("decimal(18,2)")),
        "ap" -> avg(col("l_extendedprice").cast("decimal(18,2)")),
        "ndf" -> countDistinct(col("l_returnflag")),
        // non-routable: a non-grain, non-measure column
        "mnt" -> min(col("l_tax")),
        "ad" -> avg(col("l_extendedprice"))) // double avg: never routes
      val filterPool: Seq[Column] = Seq(
        col("o_orderpriority") =!= "1-URGENT",
        col("l_quantity") <= 40.0,
        col("l_returnflag") =!= "R")
      for (i <- 1 to 16) {
        val groups = rnd.shuffle(grain).take(rnd.nextInt(grain.size + 1))
        val picked = rnd.shuffle(aggPool).take(1 + rnd.nextInt(3))
        val aggs = picked.map { case (n, c) => c.as(n) }
        val filters = rnd.shuffle(filterPool).take(rnd.nextInt(3))
        val q = () => {
          val base = filters.foldLeft(src())(_ filter _)
          val agged =
            if (groups.isEmpty) base.agg(aggs.head, aggs.tail: _*)
            else base.groupBy(groups.map(col): _*)
              .agg(aggs.head, aggs.tail: _*)
          agged.orderBy(groups.map(col) :+ col(picked.head._1): _*)
        }
        cmp(q, s"two-leaf delta shape $i (groups=$groups " +
          s"filters=${filters.size} aggs=${picked.map(_._1)})")
      }
      // and the one-call fold catches the summary up: after
      // refreshDelta the same shapes route summary-only
      assert(Summaries.refreshDelta("prop_j2").isDefined)
      cmp(() => src().groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("sp"))
        .orderBy("o_orderpriority"), "post-fold shape")
    } finally {
      Summaries.drop("prop_j2")
      java.nio.file.Files.walk(dir.toPath).iterator().asScala.toSeq
        .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
