package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** Queries authored as SQL text (the reference's second query surface
  * — literal BigQuery SQL in the notebook, SURVEY.md §0) run through
  * spark.sql over registered views: parser → Catalyst → same physical
  * plans as the DataFrame API. Covers the SQL-only surfaces: GROUPING
  * SETS, correlated subqueries, LIKE/string functions.
  */
object SqlQueries {

  private def view(spark: SparkSession, sfDir: String, t: String): String = {
    val name = s"graft_${t}"
    Tables.load(spark, sfDir, t).createOrReplaceTempView(name)
    name
  }

  /** Explicit GROUPING SETS — the general form rollup/cube sugar over:
    * per-flag, per-status, and grand-total rows only (no cross
    * product).
    */
  def groupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    val li = view(spark, sfDir, "lineitem")
    spark.sql(
      s"""SELECT coalesce(l_returnflag, '(all)') AS returnflag,
         |  coalesce(l_linestatus, '(all)') AS linestatus,
         |  round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
         |FROM $li
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY returnflag, linestatus""".stripMargin)
  }

  /** String-function surface: LIKE filter + upper/substr/replace/
    * concat_ws/length — all codegen'd built-ins, identical semantics
    * in DuckDB.
    */
  def stringFunctions(spark: SparkSession, sfDir: String): DataFrame = {
    val part = view(spark, sfDir, "part")
    spark.sql(
      s"""SELECT p_partkey,
         |  upper(p_brand) AS brand_uc,
         |  substr(p_name, 1, 10) AS name_prefix,
         |  replace(p_type, ' ', '_') AS type_snake,
         |  concat_ws('|', p_brand, p_type) AS brand_type,
         |  length(p_name) AS name_len
         |FROM $part
         |WHERE p_name LIKE '%a%'
         |ORDER BY p_partkey""".stripMargin)
  }

  /** Orders worth more than twice their customer's average — the
    * correlated-scalar-subquery shape, hand-decorrelated into a window
    * (`avg OVER (PARTITION BY o_custkey)` then filter). Catalyst's
    * automatic decorrelation plans subquery-as-join: two scans of
    * orders plus a join; the window form is one scan and one shuffle
    * on o_custkey (~10× faster here, and the difference only grows
    * with table size). The oracle keeps the subquery spelling — same
    * rows (every row's partition avg equals its correlated avg).
    */
  def bigSpenders(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = view(spark, sfDir, "orders")
    spark.sql(
      s"""SELECT o_orderkey, o_custkey, o_totalprice
         |FROM (SELECT o_orderkey, o_custkey, o_totalprice,
         |        avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cavg
         |      FROM $ord)
         |WHERE o_totalprice > 2 * cavg
         |ORDER BY o_orderkey""".stripMargin)
  }

  /** Gap-filled monthly order series over a RECURSIVE date spine
    * (`WITH RECURSIVE`, Spark 4) — the time-series idiom a plain
    * GROUP BY month (q37) can't express: months with zero orders
    * surface as explicit zero rows because the spine, not the data,
    * defines the axis. The recursion is a linear 80-row generator
    * (one row per level, trivially under the recursion limit); the
    * fact table joins to it on the truncated month and aggregates.
    */
  def monthlySpine(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = view(spark, sfDir, "orders")
    spark.sql(
      s"""WITH RECURSIVE months(m) AS (
         |  SELECT TIMESTAMP '1995-01-01'
         |  UNION ALL
         |  SELECT m + INTERVAL 1 MONTH FROM months
         |  WHERE m < TIMESTAMP '2001-08-01'
         |)
         |SELECT m AS month_start,
         |  count(o_orderkey) AS n_orders,
         |  round(coalesce(sum(o_totalprice), 0), 2) AS total_price
         |FROM months LEFT JOIN $ord
         |  ON date_trunc('MONTH', o_orderdate) = m
         |GROUP BY m
         |ORDER BY m""".stripMargin)
  }

  /** LATERAL correlated subquery (Spark 4): each customer's single
    * highest-value order. Catalyst decorrelates the per-row LIMIT 1
    * subquery into a rank-filtered join rather than executing it per
    * customer — the plan a naive nested-loop engine can't afford at
    * scale. Tie-broken on orderkey so both engines agree exactly.
    */
  def topOrderLateral(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = view(spark, sfDir, "customer")
    val ord = view(spark, sfDir, "orders")
    spark.sql(
      s"""SELECT c_custkey, o_orderkey, o_totalprice
         |FROM $cust,
         |LATERAL (
         |  SELECT o_orderkey, o_totalprice FROM $ord
         |  WHERE o_custkey = c_custkey
         |  ORDER BY o_totalprice DESC, o_orderkey
         |  LIMIT 1
         |)
         |ORDER BY c_custkey""".stripMargin)
  }
}
