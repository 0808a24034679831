package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 made the converters `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils); third-party
  * Catalyst extensions reach them through a same-package bridge —
  * the established pattern for libraries shipping custom Expressions.
  * Kept to two one-line forwarders; everything else lives in graft.
  */
object GraftColumnBridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
