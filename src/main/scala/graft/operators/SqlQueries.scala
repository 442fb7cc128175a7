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

  /** Correlated scalar subquery (decorrelated by Catalyst into a
    * join): orders worth more than twice their customer's average.
    */
  def bigSpenders(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = view(spark, sfDir, "orders")
    spark.sql(
      s"""SELECT o_orderkey, o_custkey, o_totalprice
         |FROM $ord o
         |WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice)
         |                          FROM $ord o2
         |                          WHERE o2.o_custkey = o.o_custkey)
         |ORDER BY o_orderkey""".stripMargin)
  }
}
