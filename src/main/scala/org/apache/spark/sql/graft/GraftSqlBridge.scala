package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The two `private[sql]` seams the SQL DML surface cannot avoid — the
  * same bridge pattern [[GraftStreamingBridge]] uses (and Delta's
  * `DeltaSqlAstBuilder` package uses for the identical reason):
  *
  *   - a resolved Catalyst `Expression` (a DELETE/UPDATE condition or an
  *     assignment value, rebound to unresolved attribute names) has to
  *     become a public `Column` so the library executors
  *     ([[graft.sources.VersionedTable]] `delete`/`update`/`merge`) can
  *     apply it to a freshly-planned frame — only
  *     `classic.ExpressionUtils.column` constructs that wrapper;
  *   - a resolved source `LogicalPlan` (MERGE's source relation) has to
  *     become a `DataFrame` — only `classic.Dataset.ofRows` does.
  *
  * Nothing else of Spark's internals is touched here.
  */
object GraftSqlBridge {

  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
