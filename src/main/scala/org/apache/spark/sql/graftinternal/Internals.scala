package org.apache.spark.sql.graftinternal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `private[sql]` Column↔Expression conversion (Spark 4 wraps
  * Columns in ColumnNodes; this is the supported classic-session path).
  * Lives under org.apache.spark.sql to satisfy the access modifier — the
  * same pattern public Spark extensions use (cf. SNIPPETS.md [2],[3]).
  */
object Internals {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a SQL function on a live session (FunctionRegistry is
    * `private[sql]`; session-construction-time `injectFunction` doesn't
    * need this bridge, post-hoc installation does).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
}
