package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator family from SURVEY.md §2,
  * re-expressed Spark-first; [[oracleSql]] carries the DuckDB twin for
  * the driver's hash-compare. Column names/aliases match exactly
  * between the two, and every floating aggregate is rounded on both
  * sides so double-summation order (Spark partial aggs vs DuckDB
  * sequential) can't flip low bits.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The reference's headline analysis (notebook cells 7+8,
    * README.md:176-222): group event durations, sum/avg/min/max, order
    * by total desc, top 20 — here over the `events` table (FIXTURES.md
    * maps `value` by `event_type` ≙ `dur` by `arg_name`).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.eventsTopK(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_events_topk" -> (Queries.eventsTopK _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_events_topk" ->
      """SELECT event_type,
        |  round(sum(value), 4) AS total_value,
        |  round(avg(value), 4) AS avg_value,
        |  round(min(value), 4) AS min_value,
        |  round(max(value), 4) AS max_value,
        |  count(*) AS n_events
        |FROM events
        |GROUP BY event_type
        |ORDER BY total_value DESC, event_type
        |LIMIT 20""".stripMargin
  )
}

/** The query catalog: named, reusable builders over the testdata
  * tables. Kept separate from the SparkEntry contract so library users
  * can call them directly.
  */
object Queries {

  /** A1+O1+O2 (SURVEY §2.4, §2.6): hash group-by multi-agg + ordinal
    * sort desc + LIMIT — the reference's cell-8 query shape
    * (README.md:210-222). Partial+final hash aggregation and
    * TakeOrderedAndProject are Catalyst built-ins; at 100 TB this is a
    * single shuffle on event_type (5 groups → map-side combine does
    * almost all the work).
    */
  def eventsTopK(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(
        round(sum("value"), 4).as("total_value"),
        round(avg("value"), 4).as("avg_value"),
        round(min("value"), 4).as("min_value"),
        round(max("value"), 4).as("max_value"),
        count(lit(1)).as("n_events"))
      .orderBy(desc("total_value"), asc("event_type"))
      .limit(20)
}
