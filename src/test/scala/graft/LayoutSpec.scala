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

  test("3-part warehouse namespace: idempotent DDL, freshness-gated rebuild") {
    import org.apache.spark.sql.functions.col
    // CREATE SCHEMA IF NOT EXISTS is re-runnable (reference handler.py:76)
    Layout.ensureNamespace(spark)
    Layout.ensureNamespace(spark)
    val (li, ord) = Layout.ensureBucketedStar(spark, TestSpark.Sf0001)
    assert(li.startsWith("spark_catalog.graft_wh."))
    assert(spark.catalog.tableExists(li) && spark.catalog.tableExists(ord))
    assert(spark.table(li).count() > 0)
    // second ensure with unchanged source = no-op (same recorded signature)
    def sigOf(t: String): String =
      spark.sql(s"SHOW TBLPROPERTIES $t").collect()
        .find(_.getString(0) == "graft.src.sig").get.getString(1)
    val sig1 = sigOf(li)
    Layout.ensureBucketedStar(spark, TestSpark.Sf0001)
    assert(sigOf(li) == sig1)
    // a regenerated source (new bytes on disk) forces a rebuild
    val src = TestSpark.tempDir("bucketsrc")
    val tbl = "spark_catalog.graft_wh.freshness_probe"
    def writeSrc(n: Int): Unit = spark.range(n).toDF("k")
      .write.mode("overwrite").parquet(s"$src/t.parquet")
    def ensure(): Unit = Layout.ensureBucketedTable(spark, s"$src/t.parquet",
      spark.read.parquet(s"$src/t.parquet"), "k", 4, tbl)
    writeSrc(10); ensure()
    assert(spark.table(tbl).count() == 10)
    writeSrc(25); ensure()
    assert(spark.table(tbl).count() == 25, "stale table survived a source regen")
    assert(spark.table(tbl).filter(col("k") >= 0).count() == 25)
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
