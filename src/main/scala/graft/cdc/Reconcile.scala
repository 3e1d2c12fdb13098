package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source↔warehouse reconciliation (operator A19,
  * `/root/reference/source/start_dms_replication_task_lambda/handler.py:27-73`):
  * the reference counts rows on both sides of the pipeline and surfaces
  * both numbers. We add the key-level diff the counts only hint at.
  */
object Reconcile {

  /** Row-count reconciliation: one row with both counts and the lag.
    * Two O(1)-output aggregations — no data movement beyond partial
    * counts. */
  def counts(source: DataFrame, target: DataFrame): DataFrame = {
    val s = source.groupBy().agg(count(lit(1)).as("source_count"))
    val t = target.groupBy().agg(count(lit(1)).as("target_count"))
    s.crossJoin(t).withColumn("lag", col("source_count") - col("target_count"))
      .withColumn("in_sync", col("lag") === 0L)
  }

  /** g_reconcile_counts — the A19 check as a driver-verifiable query:
    * customer keys (source) vs distinct ordering customers (target). */
  def countsQuery(spark: SparkSession, dir: String): DataFrame =
    counts(
      graft.Tables.customer(spark, dir).select(col("c_custkey")),
      graft.Tables.orders(spark, dir).select(col("o_custkey")).distinct())

  /** Key-level divergence: keys present in source but not target
    * (replication lag / drops) and vice versa (ghost rows). Anti joins
    * ship only the key column. */
  def keyDiff(source: DataFrame, target: DataFrame, keyCol: String): DataFrame = {
    val missing = source.select(col(keyCol))
      .join(target.select(col(keyCol)), Seq(keyCol), "left_anti")
      .withColumn("diff", lit("missing_in_target"))
    val ghost = target.select(col(keyCol))
      .join(source.select(col(keyCol)), Seq(keyCol), "left_anti")
      .withColumn("diff", lit("ghost_in_target"))
    missing.unionByName(ghost).orderBy(col("diff"), col(keyCol))
  }
}
