package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the classic Column⇄Expression factories, which are
  * `private[sql]` since the Spark 4 Column/Connect refactor. Lives in the
  * `org.apache.spark.sql` package solely to re-export them for graft's
  * native Catalyst expressions ([[graft.functions.native]]); contains no
  * logic of its own. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
