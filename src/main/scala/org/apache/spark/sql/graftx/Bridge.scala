package org.apache.spark.sql.graftx

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{SparkSession => ClassicSession, Dataset => ClassicDataset}

/** Narrow bridge into `private[sql]` constructors that Spark does not expose
  * publicly but that any library adding its own logical/physical operators
  * needs: build a DataFrame from a custom [[LogicalPlan]] and convert a
  * public [[Column]] to its Catalyst [[Expression]]. Living under
  * `org.apache.spark.sql` is the established pattern for Spark-native
  * extension libraries (the alternative — reflection — trades compile-time
  * checking for nothing). Everything else in graft uses public APIs only.
  */
object Bridge {

  /** DataFrame over a (possibly unresolved) logical plan; runs the full
    * analyzer/optimizer on first action, so custom nodes get standard
    * expression resolution against their children.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** Catalyst expression backing a public Column, fully converted through
    * the session's ColumnNode converter (ExpressionUtils.expression alone
    * returns a lazy non-serializable wrapper).
    */
  def expression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[ClassicSession].expression(c)

  /** The analyzed logical plan of a DataFrame (stable child for a custom
    * logical node built on top of an existing frame).
    */
  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[ClassicDataset[_]].queryExecution.analyzed

  /** Public Column over a raw Catalyst expression — the inverse of
    * [[expression]]. Needed to use internal codegen'd expressions Spark
    * ships but doesn't expose as functions (e.g.
    * `BloomFilterMightContain`, which otherwise exists only inside the
    * optimizer's runtime-filter rewrite).
    */
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
