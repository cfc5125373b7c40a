package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the `private[sql]` Column ↔ catalyst Expression
  * conversions (`classic.ExpressionUtils`), needed to expose custom
  * codegen'd expressions (graft.functions.DotProductExpr) as Columns.
  * Lives in the Spark SQL package solely for access; contains no logic.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The session's `private[sql]` UUID — unique per SparkSession instance
    * for the JVM's lifetime; graft.Tables.memoKey uses it as the
    * session-scoped memo key (identityHashCode could be reused after GC).
    */
  def sessionUUID(spark: SparkSession): String =
    spark.asInstanceOf[classic.SparkSession].sessionUUID

  /** Non-blocking read of an Observation's metrics (`getOrEmpty` is
    * `private[sql]`): empty map until the SQL-execution-end listener
    * delivers. graft.operators.Observed polls this so iterative operators
    * can ride their convergence probe on the materializing action.
    */
  def observationGetOrEmpty(obs: Observation): Map[String, Any] =
    obs.getOrEmpty

  /** Register a temp SQL function in an already-running session (the
    * extensions path only applies at session construction).
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
