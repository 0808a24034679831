package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression and DataFrame ⇄ LogicalPlan bridge for graft's
  * native Catalyst extensions.
  *
  * Spark 4 made the converters `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils / classic.Dataset);
  * third-party Catalyst extensions reach them through a same-package
  * bridge — the established pattern for libraries shipping custom
  * Expressions and LogicalPlans. Kept to one-line forwarders;
  * everything else lives in graft.
  */
object GraftColumnBridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)

  /** Eagerly convert a Column to its catalyst Expression. `toExpr`
    * returns a lazy ColumnNodeExpression wrapper whose tree still
    * holds sql.internal AST nodes (non-serializable, and opaque to
    * pattern matches on e.g. catalyst SortOrder); this runs the
    * classic converter now.
    */
  def toCatalystExpr(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap a (resolved) LogicalPlan — e.g. graft.plans.TopKPerGroup —
    * as a DataFrame on the session.
    */
  def toDF(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed plan of a DataFrame (attribute source for building
    * resolved custom nodes on top of it).
    */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** Register extra planner strategies on an already-built session. */
  def addStrategy(spark: SparkSession,
      s: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(s))
      exp.extraStrategies = exp.extraStrategies :+ s
  }
}
