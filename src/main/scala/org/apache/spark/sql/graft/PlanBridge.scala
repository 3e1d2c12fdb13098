package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge from a Catalyst [[LogicalPlan]] back to a public DataFrame
  * (`Dataset.ofRows` is `private[sql]` — same one-file-shim pattern as
  * [[ColumnBridge]]). Used by SQL command lowerings that carry a
  * statement's sub-plan (e.g. MERGE's USING source) and need to execute
  * it as a normal DataFrame at run time — re-analyzed in the live
  * session, so names resolve against current state. */
object PlanBridge {
  def dataFrame(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
