package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge. Spark 4 moved these behind
  * `private[sql]`, so extension libraries host the two calls inside
  * the sql package — the same pattern public Spark-extension projects
  * use (cf. SNIPPETS.md [3], Qbeast's DatasetFactory).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
