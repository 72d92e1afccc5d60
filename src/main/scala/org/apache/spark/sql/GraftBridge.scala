package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal friend-package bridge: Column ↔ catalyst Expression and
  * DataFrame ↔ LogicalPlan converters (Spark 4's Column wraps a ColumnNode;
  * the classic converters are `private[sql]`). This is the only file
  * outside the `graft` package.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzedPlan(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  def optimizedPlan(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.optimizedPlan

  /** Isolated child session whose SQLConf is a COPY of the parent's —
    * unlike `newSession()`, which rebuilds SQLConf from SparkConf defaults
    * and silently drops every runtime conf the caller set via
    * `spark.conf.set` (AQE toggles, codegen limits, `spark.sql.files.*`).
    * This is Spark's own per-microbatch session mechanism
    * (`SparkSession.cloneSession`, `private[sql]`), exposed for scoped
    * conf overrides. */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()

  /** Drain the async listener bus — lets tests assert on SparkListener
    * counters (e.g. "analysis launched zero jobs") without sleeps. */
  def waitListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
