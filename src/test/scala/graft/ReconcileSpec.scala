package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.{Reconcile, ReconcileMetrics}

/** A19 reconciliation: counts, lag, and key-level divergence. */
class ReconcileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("counts reports lag and sync flag") {
    import spark.implicits._
    val src = Seq(1, 2, 3, 4).toDF("k")
    val tgt = Seq(1, 2, 3).toDF("k")
    val r = Reconcile.counts(src, tgt).collect().head
    assert(r.getAs[Long]("source_count") === 4)
    assert(r.getAs[Long]("target_count") === 3)
    assert(r.getAs[Long]("lag") === 1)
    assert(!r.getAs[Boolean]("in_sync"))
    val sync = Reconcile.counts(src, src).collect().head
    assert(sync.getAs[Boolean]("in_sync"))
  }

  test("metrics listener publishes a lagging tick, then an in-sync tick (A19 observability)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val whDir = TestSpark.tempDir("reconwh") + "/t"
    // source of truth: 4 fixed keys; target: whatever the stream has landed
    val source = () => Seq("k1", "k2", "k3", "k4").toDF("key")
    val target: () => DataFrame = () =>
      if (new java.io.File(whDir).exists) spark.read.parquet(whDir)
      else spark.emptyDataFrame
    val rec = new ReconcileMetrics.Recorder
    val listener = new ReconcileMetrics.Listener("recon_q", source, target, rec.publish)
    spark.streams.addListener(listener)
    val input = MemoryStream[String]
    val q = input.toDS().toDF("key").writeStream
      .queryName("recon_q")
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.write.mode("append").parquet(whDir); ()
      }
      .start()
    def awaitTick(cond: ReconcileMetrics.Tick => Boolean, what: String): ReconcileMetrics.Tick = {
      val deadline = System.currentTimeMillis() + 60000
      while (!rec.all.exists(cond) && System.currentTimeMillis() < deadline)
        Thread.sleep(50) // listener bus is async; progress arrives late
      rec.all.find(cond).getOrElse(fail(s"no $what tick within 60s: ${rec.all}"))
    }
    try {
      input.addData("k1", "k2")
      q.processAllAvailable()
      val lagging = awaitTick(t => t.targetCount == 2, "lagging")
      assert(lagging.sourceCount === 4 && lagging.lag === 2 && !lagging.inSync)
      input.addData("k3", "k4")
      q.processAllAvailable()
      val synced = awaitTick(t => t.inSync, "in-sync")
      assert(synced.sourceCount === 4 && synced.targetCount === 4 && synced.lag === 0)
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }

  test("keyDiff finds missing and ghost keys") {
    import spark.implicits._
    val src = Seq(1, 2, 3).toDF("k")
    val tgt = Seq(2, 3, 9).toDF("k")
    val d = Reconcile.keyDiff(src, tgt, "k").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(d === Set((1, "missing_in_target"), (9, "ghost_in_target")))
  }

  test("fkAudit: the fixture star is referentially intact; broken edges surface") {
    val rows = Reconcile.fkAudit(spark, TestSpark.Sf0001).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getLong(1) > 0L, s"empty child side: ${r.getString(0)}")
      assert(r.getLong(2) === 0L && r.getBoolean(3),
        s"fixture should have no orphans: $r")
    }
    // equal COUNT(*)s can hide a broken reference — an orphan cannot:
    // replace one lineitem orderkey with a key orders does not have
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, TestSpark.Sf0001)
      .withColumn("l_orderkey",
        when(monotonically_increasing_id() === 0, lit(-999L))
          .otherwise(col("l_orderkey")))
    val edge = li.select(col("l_orderkey").as("k"))
      .join(Tables.orders(spark, TestSpark.Sf0001)
        .select(col("o_orderkey").as("k")).distinct()
        .withColumn("hit", lit(1)), Seq("k"), "left")
      .agg(sum(when(col("hit").isNull, 1L).otherwise(0L))).as[Long].head()
    assert(edge === 1L, "injected orphan must be counted")
  }

  test("fkAudit one-scan fact pass (r19) ≡ the per-edge audit shape") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.Sf0001
    val got = Reconcile.fkAudit(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    // the former shape: one full child scan + keyed join per edge
    def edge(name: String, child: org.apache.spark.sql.DataFrame,
        ck: String, parent: org.apache.spark.sql.DataFrame, pk: String) = {
      val r = child.select(col(ck).as("k"))
        .join(parent.select(col(pk).as("k")).distinct()
          .withColumn("hit", lit(1)), Seq("k"), "left")
        .agg(count(lit(1)).as("n"),
          sum(when(col("hit").isNull, 1L).otherwise(0L)).as("o"))
        .head()
      (name, r.getLong(0), r.getLong(1), r.getLong(1) == 0L)
    }
    val want = Set(
      edge("customer.nationkey->nation",
        Tables.customer(spark, dir), "c_nationkey",
        Tables.nation(spark, dir), "n_nationkey"),
      edge("lineitem.orderkey->orders",
        Tables.lineitem(spark, dir), "l_orderkey",
        Tables.orders(spark, dir), "o_orderkey"),
      edge("lineitem.partkey->part",
        Tables.lineitem(spark, dir), "l_partkey",
        Tables.part(spark, dir), "p_partkey"),
      edge("lineitem.suppkey->supplier",
        Tables.lineitem(spark, dir), "l_suppkey",
        Tables.supplier(spark, dir), "s_suppkey"),
      edge("orders.custkey->customer",
        Tables.orders(spark, dir), "o_custkey",
        Tables.customer(spark, dir), "c_custkey"))
    assert(got === want, "one-scan audit diverged from per-edge audits")
  }
}
