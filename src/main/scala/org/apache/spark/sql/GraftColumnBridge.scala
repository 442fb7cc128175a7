package org.apache.spark.sql

import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.CatalogStatistics
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression converters and the
  * session catalog — the standard pattern for Spark extension
  * libraries that expose custom Catalyst expressions (graft.functions)
  * and estimator-driven statistics (graft.plans.GraftAnalyze) through
  * public APIs. Nothing else in this package: keep the surface one
  * file wide.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Install statistics for a catalog table (what ANALYZE TABLE does,
    * with estimator-supplied numbers) and drop the cached relation so
    * the next resolution picks them up.
    */
  def setTableStats(spark: SparkSession, table: String,
      stats: CatalogStatistics): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState
    val ident = cs.sqlParser.parseTableIdentifier(table)
    cs.catalog.alterTableStats(ident, Some(stats))
    cs.catalog.refreshTable(ident)
  }

  /** Current catalog stats of a table, if any. */
  def tableStats(spark: SparkSession, table: String)
      : Option[CatalogStatistics] = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState
    cs.catalog.getTableMetadata(
      cs.sqlParser.parseTableIdentifier(table)).stats
  }

  /** Block until the async SparkListener bus has delivered every
    * queued event (or the timeout passes) — the deterministic
    * replacement for sleep-before-reading-a-listener in specs that
    * count jobs.
    */
  def drainListenerBus(spark: SparkSession, timeoutMs: Long): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)

  /** A DataFrame over an existing logical plan — the standard
    * `Dataset.ofRows` spelling extension libraries use to re-plan a
    * query under different conf (e.g. the routing explainer's
    * rule-disabled re-optimization).
    */
  def ofPlan(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The single column NAME a Column references, when it is a plain
    * attribute reference (`col("x")`); None for computed expressions.
    * Lets estimator code key a Column against catalog column
    * statistics without resolving it against a plan.
    */
  def simpleAttrName(c: Column): Option[String] = c.node match {
    case a: org.apache.spark.sql.internal.UnresolvedAttribute
        if a.nameParts.length == 1 => Some(a.nameParts.head)
    case _ => None
  }
}
