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

  /** One foreign-key edge of [[fkAudit]]: child rows vs the parent key
    * set, counting orphans in a single keyed join pass (the key column
    * is all that ships; n_child rides the same aggregation — no second
    * scan). */
  private def edgeAudit(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey).as("k"))
      .join(parent.select(col(parentKey).as("k")).distinct()
        .withColumn("hit", lit(1)), Seq("k"), "left")
      .agg(count(lit(1)).as("n_child"),
        sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_orphans"))
      .select(lit(name).as("edge"), col("n_child"), col("n_orphans"),
        (col("n_orphans") === 0L).as("ok"))

  /** g_fk_audit — referential-integrity audit across the star's
    * foreign-key edges: per edge, child cardinality, orphan count
    * (child keys with no parent), and a pass flag. The key-level
    * generalization of the reference's COUNT(*) reconciliation
    * (`start_dms_replication_task_lambda/handler.py:27-73`): equal row
    * counts can hide broken references after a partial load or an
    * out-of-order CDC apply; orphan counts cannot.
    *
    * Scale shape: each edge ships ONLY its key column into one keyed
    * join (dims broadcast under AQE stats; lineitem→orders is the one
    * genuine big-big edge and rides the same shuffle the star queries
    * already bucket for), orphan counting collapses map-side into a
    * 1-row aggregate per edge, and the 5-row union is driver-trivial. */
  def fkAudit(spark: SparkSession, dir: String): DataFrame = {
    val t = graft.Tables
    Seq(
      edgeAudit("customer.nationkey->nation",
        t.customer(spark, dir), "c_nationkey", t.nation(spark, dir), "n_nationkey"),
      edgeAudit("lineitem.orderkey->orders",
        t.lineitem(spark, dir), "l_orderkey", t.orders(spark, dir), "o_orderkey"),
      edgeAudit("lineitem.partkey->part",
        t.lineitem(spark, dir), "l_partkey", t.part(spark, dir), "p_partkey"),
      edgeAudit("lineitem.suppkey->supplier",
        t.lineitem(spark, dir), "l_suppkey", t.supplier(spark, dir), "s_suppkey"),
      edgeAudit("orders.custkey->customer",
        t.orders(spark, dir), "o_custkey", t.customer(spark, dir), "c_custkey"))
      .reduce(_ unionByName _)
      .orderBy(col("edge"))
  }
}
