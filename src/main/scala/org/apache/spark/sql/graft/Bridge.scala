package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark-4 Column <-> catalyst Expression bridge.
  *
  * Spark 4 routes `Column` through ColumnNode (the Connect-compatible
  * representation) and gates the classic-expression conversion behind
  * `private[sql] ExpressionUtils`. This object lives under
  * `org.apache.spark.sql` solely to re-export those two conversions to
  * graft's native-expression layer (`graft.functions`); it contains no
  * logic of its own.
  */
object Bridge {
  /** Wrap a catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Recover the catalyst Expression behind a (classic-session) Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
