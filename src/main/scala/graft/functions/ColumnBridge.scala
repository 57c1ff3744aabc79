package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. `ExpressionUtils` is private[sql], so
 * this one-file shim (the standard pattern for Spark extension libraries)
 * lives under org.apache.spark.sql to re-export the two conversions the
 * engine's custom expressions need. No other Spark internals are touched
 * from this package. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A DataFrame over an explicit logical plan (`Dataset.ofRows` is
   * private[sql]) — what the SQL statement surface uses to splice
   * store-resolved, version-pinned scans under a parsed SELECT in
   * place of its unresolved table references. */
  def dataset(spark: org.apache.spark.sql.SparkSession,
              plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
