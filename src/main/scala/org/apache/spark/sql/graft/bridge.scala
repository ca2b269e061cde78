package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column↔Expression conversion.
  * Spark 4 routes Column through ColumnNode; third-party Catalyst extensions
  * (this is the same approach Delta/Frameless use) need one in-package shim
  * to wrap a custom Expression as a user-facing Column.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a custom LogicalPlan as a user-facing DataFrame — the
    * whole-operator analogue of [[column]] (custom logical nodes have no
    * public constructor path; `Dataset.ofRows` is `private[sql]`).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Rebuild a DataFrame from an RDD of InternalRows without the external
    * Row codec round trip (`spark.internalCreateDataFrame` is
    * `private[sql]`). Used by operators that must leave the SQL engine for
    * an RDD primitive (zipWithIndex) and come back — per-row conversion
    * through external Rows measured ~4× slower on wide scans.
    */
  def internalCreateDataFrame(spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
