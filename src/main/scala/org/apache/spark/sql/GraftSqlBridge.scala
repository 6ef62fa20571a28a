package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` helpers for building `Column`s from custom
  * Catalyst expressions (the supported classic-API path in Spark 4). */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame from a custom logical plan (e.g. a
    * [[graft.plans.RechunkPlan]] node lowered by an injected strategy). */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** True when the session holds NO cached/persisted plans — the
    * cache-hygiene assertion for long-lived sessions: every pipeline
    * that persists intermediates must release them (the `...Releasable`
    * contract), so a suite run with no `clearCache` ends empty. */
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty
}
