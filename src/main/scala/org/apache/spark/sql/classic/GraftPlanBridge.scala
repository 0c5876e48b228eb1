package org.apache.spark.sql.classic

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Access bridge for building a DataFrame from a custom LogicalPlan —
  * `Dataset.ofRows` is `private[sql]`, and planting a one-line forwarder
  * inside the package is the standard extension-library practice (every
  * Spark connector/extension that materializes its own logical nodes
  * ships one). Nothing else from the internal API is re-exported.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark, plan)

  /** Column → Catalyst Expression (the Spark 4 Column API hides its
    * expression behind the connect-compatible ColumnNode). EAGER
    * conversion via the node converter — `ExpressionUtils.expression`
    * defers behind a lazy wrapper that keeps non-serializable
    * `sql.internal` nodes alive inside the expression tree.
    */
  def expr(c: org.apache.spark.sql.Column)
  : org.apache.spark.sql.catalyst.expressions.Expression =
    ColumnNodeToExpressionConverter(c.node)

  /** Catalyst Expression → Column (the inverse of [[expr]]): lets library
    * code use a custom codegen expression without the session function
    * registry — important for operators callable before / without
    * `VectorFunctions.register`.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
  : org.apache.spark.sql.Column =
    ExpressionUtils.column(e)
}
