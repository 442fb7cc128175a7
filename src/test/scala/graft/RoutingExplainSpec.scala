package graft

import org.apache.spark.sql.functions._
import graft.operators.OlapQueries
import graft.plans.{RoutingExplain, Summaries, SummaryRewrite}
import graft.sources.Tables

/** The router's diagnosis surface: every fail-closed gate names
  * itself, and routed queries say which summary (and whether the read
  * is delta-compensated). Fail-closed routing is only operable when
  * the refusal is one call away from a reason.
  */
class RoutingExplainSpec extends SparkSpec {

  private def li = Tables.load(spark, sf, "lineitem")

  private def withPricing[A](body: => A): A = {
    OlapQueries.registerPricingSummary(spark, sf)
    try body finally Summaries.drop("lineitem_pricing")
  }

  test("a routed aggregate reports its summary; refusals name the gate") {
    withPricing {
      // routes: grain grouping + declared measure
      val ok = li.groupBy("l_returnflag")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("s"))
      val r1 = RoutingExplain.explain(ok)
      assert(r1.contains("ROUTES onto 'lineitem_pricing'"), r1)
      assert(r1.contains("(fresh)"), r1)

      // non-grain grouping column
      val bad1 = li.groupBy("l_suppkey").agg(count(lit(1)).as("n"))
      val r2 = RoutingExplain.explain(bad1)
      assert(r2.contains("stays RAW"), r2)
      assert(r2.contains("non-grain column(s): l_suppkey"), r2)

      // undeclared sum measure
      val bad2 = li.groupBy("l_returnflag")
        .agg(sum(col("l_discount").cast("decimal(18,2)")).as("s"))
      val r3 = RoutingExplain.explain(bad2)
      assert(r3.contains("sum measure not declared"), r3)

      // double AVG
      val bad3 = li.groupBy("l_returnflag")
        .agg(avg(col("l_extendedprice")).as("a"))
      val r4 = RoutingExplain.explain(bad3)
      assert(r4.contains("avg over a double input"), r4)

      // Welford stddev
      val bad4 = li.groupBy("l_returnflag")
        .agg(stddev(col("l_quantity")).as("sd"))
      val r5 = RoutingExplain.explain(bad4)
      assert(r5.contains("double Welford"), r5)
      assert(r5.contains("stddev_samp_exact"), r5)
    }
  }

  test("a DERIVED (aliased) grouping key gets a verdict too — the " +
      "optimizer pulls the expression into a Project alias, and the " +
      "diagnosis must cover the same aggregates the rewrite does") {
    withPricing {
      val derived = li
        .groupBy(date_trunc("month", col("l_shipdate")).as("mo"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("s"))
      val r = RoutingExplain.explain(derived)
      assert(r.contains("ROUTES onto 'lineitem_pricing'"),
        s"an aliased-grouping aggregate must be diagnosable:\n$r")
    }
  }

  test("unregistered sources, partial builds, and disabled router " +
      "explain themselves") {
    val none = RoutingExplain.explain(
      li.groupBy("l_returnflag").agg(count(lit(1)).as("n")))
    assert(none.contains("no summary registered"), none)

    Summaries.create(
      li.filter(col("l_shipdate") < lit("1995-01-01").cast("timestamp")),
      "spec_explain_partial",
      grain = Seq("l_returnflag"), sums = Nil, partial = true)
    try {
      val part = RoutingExplain.explain(
        li.groupBy("l_returnflag").agg(count(lit(1)).as("n")))
      assert(part.contains("PARTIAL build"), part)
    } finally Summaries.drop("spec_explain_partial")

    spark.conf.set(SummaryRewrite.ConfKey, "false")
    try {
      val off = RoutingExplain.explain(
        li.groupBy("l_returnflag").agg(count(lit(1)).as("n")))
      assert(off.contains("router is disabled"), off)
    } finally spark.conf.unset(SummaryRewrite.ConfKey)
  }

  test("staleness reasons distinguish in-place drift from a " +
      "compensated append") {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("graft_explain")
      .toFile
    val srcPath = new java.io.File(dir, "li_copy").getAbsolutePath
    val slim = li.select("l_returnflag", "l_linestatus", "l_quantity",
      "l_orderkey")
    slim.filter(col("l_orderkey") % 10 < 8).write.parquet(srcPath)
    val baseFiles = new java.io.File(srcPath).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val q = () => spark.read.parquet(srcPath)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    try {
      Summaries.create(spark.read.parquet(srcPath), "spec_explain_stale",
        grain = Seq("l_returnflag", "l_linestatus"), sums = Nil)
      // append → compensated, and the report says so
      slim.filter(col("l_orderkey") % 10 >= 8)
        .write.mode("append").parquet(srcPath)
      Summaries.invalidate("spec_explain_stale")
      val r1 = RoutingExplain.explain(q())
      assert(r1.contains("delta-compensated"), r1)
      // delete a BUILT file on top of the append → MIXED drift;
      // since round 12 the cube makes this invertible count still
      // compensable, so the explainer reports the ROUTE…
      val victim = new java.io.File(srcPath).listFiles()
        .filter(f => baseFiles.contains(f.getName)).head
      assert(victim.delete())
      Summaries.invalidate("spec_explain_stale")
      val r2 = RoutingExplain.explain(q())
      assert(r2.contains("ROUTES"), r2)
      // …and the strict conf restores the suspension with a named
      // reason
      spark.conf.set(Summaries.DeleteReadKey, "false")
      try {
        val r3 = RoutingExplain.explain(q())
        assert(r3.contains("drifted IN PLACE") ||
          r3.contains("routing is suspended"), r3)
      } finally spark.conf.unset(Summaries.DeleteReadKey)
    } finally {
      Summaries.drop("spec_explain_stale")
      java.nio.file.Files.walk(dir.toPath).iterator().asScala.toSeq
        .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("Summaries.status lists registrations with live freshness") {
    withPricing {
      val s = Summaries.status()
      assert(s.contains("lineitem_pricing"), s)
      assert(s.contains("[table]"), s)
      assert(s.contains("grain=(l_returnflag, l_linestatus, l_shipdate)"),
        s)
      assert(s.contains("fresh"), s)
    }
  }

  test("join aggregates report the joined summary or the missing key") {
    OlapQueries.registerJoinPrioritySummary(spark, sf)
    try {
      val l = li
      val ord = Tables.load(spark, sf, "orders")
      val joined = l.join(ord, l("l_orderkey") === ord("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val r1 = RoutingExplain.explain(joined)
      assert(r1.contains("ROUTES onto 'li_orders_priority'"), r1)
      // different edge set → different key → unregistered
      val cust = Tables.load(spark, sf, "customer")
      val other = ord.join(cust, ord("o_custkey") === cust("c_custkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val r2 = RoutingExplain.explain(other)
      assert(r2.contains("no summary registered"), r2)
    } finally Summaries.drop("li_orders_priority")
  }
}
