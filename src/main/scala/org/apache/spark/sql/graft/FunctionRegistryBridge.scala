package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Session-level registration of custom Catalyst expressions as SQL
  * functions (FunctionRegistry is `private[sql]`, hence this shim in the
  * Spark namespace — same pattern as [[ColumnBridge]]). */
object FunctionRegistryBridge {
  def register(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
