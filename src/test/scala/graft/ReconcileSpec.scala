package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.Reconcile

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

  test("keyDiff finds missing and ghost keys") {
    import spark.implicits._
    val src = Seq(1, 2, 3).toDF("k")
    val tgt = Seq(2, 3, 9).toDF("k")
    val d = Reconcile.keyDiff(src, tgt, "k").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(d === Set((1, "missing_in_target"), (9, "ghost_in_target")))
  }
}
