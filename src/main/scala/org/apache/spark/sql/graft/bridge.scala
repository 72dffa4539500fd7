package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ⇄ Expression / plan ⇄ Dataset
  * converters — the standard integration point for libraries shipping
  * native Catalyst expressions and logical plans (Spark 4 routes Columns
  * through ColumnNodes; these helpers are the sanctioned classic-mode
  * crossover).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`): how a custom logical operator enters the public
    * Dataset API.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Free the block-manager storage behind a `localCheckpoint()`ed or
    * `checkpoint()`ed frame NOW (`LogicalRDD` is `private[sql]`).
    * Iterative algorithms that checkpoint per round would otherwise
    * accumulate every superseded round's blocks until the driver GC
    * happens to collect the Dataset — under memory pressure that is
    * exactly when eviction thrash starts. No-op for frames that are not
    * checkpoint results.
    */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false); ()
      case _ => ()
    }

  /** Look up a registered catalog plugin by name (`sessionState` and
    * the `CatalogManager` are `private[sql]`): how a stored procedure
    * that spans TWO catalogs (the cross-store transaction) resolves its
    * other-catalog table argument through that catalog's own guarded
    * resolver instead of trusting a raw path. Throws Spark's own
    * CatalogNotFoundException for an unregistered name.
    */
  def catalogPlugin(spark: SparkSession,
                    name: String): org.apache.spark.sql.connector.catalog.CatalogPlugin =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalogManager.catalog(name)

  /** Re-tag a batch frame as STREAMING (`internalCreateDataFrame` is
    * `private[sql]`): what a v1 streaming `Source.getBatch` must return
    * — the engine asserts `isStreaming` on it (MemoryStream and
    * FileStreamSource build their micro-batch frames the same way).
    */
  def asStreaming(spark: SparkSession, df: DataFrame): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
