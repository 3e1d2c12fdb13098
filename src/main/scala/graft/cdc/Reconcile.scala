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
    // r19 (guide §1.2 fewer passes, §2.4 remove shuffles): the three
    // lineitem edges share ONE scan of the BUCKETED fact instead of
    // three separate full scans — the orders key set is co-bucketed on
    // the join key (exchange-free, sort-free bucket SMJ; the same
    // layout j_star_bucketed serves from), part/supplier key sets ride
    // broadcast exactly as before, and one 1-row aggregate emits all
    // three edges' counts (exploded to the per-edge rows). Values are
    // identical: each parent side is distinct, so the left joins
    // preserve the fact cardinality, and the per-edge orphan sums are
    // the same conditional counts the per-edge legs computed.
    val (liT, ordT) = graft.ops.Layout.ensureBucketedStar(spark, dir)
    val liEdges = spark.table(liT)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      .join(spark.table(ordT).select(col("o_orderkey").as("k_o")).distinct()
        .withColumn("hit_o", lit(1)), col("l_orderkey") === col("k_o"), "left")
      .join(t.part(spark, dir).select(col("p_partkey").as("k_p")).distinct()
        .withColumn("hit_p", lit(1)), col("l_partkey") === col("k_p"), "left")
      .join(t.supplier(spark, dir).select(col("s_suppkey").as("k_s")).distinct()
        .withColumn("hit_s", lit(1)), col("l_suppkey") === col("k_s"), "left")
      .agg(count(lit(1)).as("n_child"),
        sum(when(col("hit_o").isNull, 1L).otherwise(0L)).as("no_o"),
        sum(when(col("hit_p").isNull, 1L).otherwise(0L)).as("no_p"),
        sum(when(col("hit_s").isNull, 1L).otherwise(0L)).as("no_s"))
      .select(explode(array(
        struct(lit("lineitem.orderkey->orders").as("edge"),
          col("n_child"), col("no_o").as("n_orphans")),
        struct(lit("lineitem.partkey->part").as("edge"),
          col("n_child"), col("no_p").as("n_orphans")),
        struct(lit("lineitem.suppkey->supplier").as("edge"),
          col("n_child"), col("no_s").as("n_orphans")))).as("e"))
      .select(col("e.edge").as("edge"), col("e.n_child").as("n_child"),
        col("e.n_orphans").as("n_orphans"),
        (col("e.n_orphans") === 0L).as("ok"))
    Seq(
      edgeAudit("customer.nationkey->nation",
        t.customer(spark, dir), "c_nationkey", t.nation(spark, dir), "n_nationkey"),
      liEdges,
      edgeAudit("orders.custkey->customer",
        t.orders(spark, dir), "o_custkey", t.customer(spark, dir), "c_custkey"))
      .reduce(_ unionByName _)
      .orderBy(col("edge"))
  }
}
