package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Layout

/** Bucketed co-located joins and partition pruning — asserted at the
  * plan level, since that's where the scale win lives. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed join runs with zero exchanges (co-located)") {
    val dir = TestSpark.Sf0001
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_test")
    spark.sql("DROP TABLE IF EXISTS graft_test.li_b")
    spark.sql("DROP TABLE IF EXISTS graft_test.ord_b")
    Layout.writeBucketed(
      Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "okey"),
      "okey", 8, "graft_test.li_b")
    Layout.writeBucketed(
      Tables.orders(spark, dir).select("o_orderkey", "o_totalprice")
        .withColumnRenamed("o_orderkey", "okey"),
      "okey", 8, "graft_test.ord_b")
    // force the shuffle-join path (at warehouse scale neither side
    // broadcasts; at test scale the planner would broadcast and bypass
    // the buckets entirely)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Layout.bucketedJoin(spark, "graft_test.li_b", "graft_test.ord_b", "okey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), "bucketed join still shuffles:\n" + plan)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(joined.count() > 0)
      // same join unbucketed DOES shuffle — bucketing is what removed it
      val unbucketed = Tables.lineitem(spark, dir)
        .withColumnRenamed("l_orderkey", "okey")
        .join(Tables.orders(spark, dir).withColumnRenamed("o_orderkey", "okey"), Seq("okey"))
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("day-partitioned layout prunes to one directory") {
    val dir = TestSpark.tempDir("layout") + "/events"
    Layout.writePartitionedByDay(Tables.events(spark, TestSpark.Sf0001), dir)
    val days = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("day="))
    assert(days.length > 1)
    val oneDay = days.head.stripPrefix("day=")
    val pruned = Layout.readDay(spark, dir, oneDay)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"), plan)
    assert(pruned.count() > 0)
    // partition column filter never becomes a data filter
    assert(!plan.contains("PushedFilters: [IsNotNull(day"), plan)
  }
}
