package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column<->Expression conversions so the
  * engine can expose custom Catalyst expressions as ordinary Columns
  * (Spark 4 Columns wrap ColumnNodes, not Expressions). Standard extension
  * pattern for libraries shipping native expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager ColumnNode→Expression conversion. `expression` wraps lazily
    * (ColumnNodeExpression) and relies on the analyzer to convert inside
    * KNOWN operators; custom logical nodes (graft.plans.*) need the real
    * catalyst tree up front — e.g. a `.desc` Column must become a
    * catalyst SortOrder before plan construction, or the un-converted
    * internal node leaks into the physical plan (observed: task
    * serialization failure on SortOrder$NullsLast$). */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
