package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftshim.Bridge

/** Column-level entry points for graft's native expressions. */
package object functions {

  private[graft] def toColumn(e: Expression): Column = Bridge.column(e)
  private[graft] def toExpr(c: Column): Expression = Bridge.expression(c)

  /** Porter-stem a string column (lowercases; non-`[a-z]+` pass through). */
  def porter_stem(c: Column): Column = toColumn(PorterStem(toExpr(c)))

  /** Native codegen'd dot product of two `array<float>` columns. */
  def float_dot(a: Column, b: Column): Column =
    toColumn(FloatDot(toExpr(a), toExpr(b)))

  /** Register graft SQL functions on a session (idempotent), enabling
    * `SELECT porter_stem(col)` in `spark.sql`.
    */
  def registerAll(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "porter_stem", exprs => PorterStem(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_dot", exprs => FloatDot(exprs(0), exprs(1)), "scala_udf")
  }
}
