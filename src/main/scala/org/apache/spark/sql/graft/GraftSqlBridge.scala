package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** The one `private[sql]` hop the row-level SQL commands need: turn an
  * analyzer-produced [[LogicalPlan]] (the MERGE source subquery, the
  * target relation) back into a [[DataFrame]] so the command executor
  * can drive the lake's DataFrame faces with it. Lives in
  * `org.apache.spark.sql.*` for visibility only — the same pattern every
  * DSv2 engine with row-level SQL uses (Iceberg's spark extensions keep
  * their plan↔Dataset shims in this package for the same reason). */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** Wrap a catalyst [[Expression]] (typically carrying
    * `UnresolvedAttribute`s after the row-level command rewrite re-keys
    * attributes by name) as a [[Column]] usable on a DataFrame. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    new Column(org.apache.spark.sql.classic.ExpressionColumnNode(e))
}
