package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AsofJoin

/** As-of join: inclusive point-in-time semantics, no-match nulls, and the
  * one-shuffle plan shape. */
class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("asof join picks the newest right row at-or-before each left ts") {
    import spark.implicits._
    val left = Seq(
      ("a", 5L, "l1"), ("a", 10L, "l2"), ("a", 20L, "l3"),
      ("b", 7L, "l4"), // key with no right rows at all
      ("c", 3L, "l5")  // right rows exist but all AFTER this ts
    ).toDF("k", "ts", "tag")
    val right = Seq(
      ("a", 10L, 1.0), // equal-ts: INCLUSIVE (l2 must see it)
      ("a", 12L, 2.0),
      ("c", 9L, 9.0)
    ).toDF("k", "ts", "v")
    val out = AsofJoin.asofJoin(left, right, "k", "ts", "ts", Seq("v"))
      .select($"tag", $"asof.v".as[Option[Double]])
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out === Map(
      "l1" -> None,        // before any right row
      "l2" -> Some(1.0),   // equal ts counts
      "l3" -> Some(2.0),   // newest of the two priors
      "l4" -> None,        // key absent from right
      "l5" -> None))       // right rows only in the future
  }

  test("asof join against the full right table is the identity lookup") {
    import spark.implicits._
    // every left row finds itself (ts equality is inclusive), so the
    // carried payload equals the row's own value
    val t = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("b", 1L, 30.0))
      .toDF("k", "ts", "v")
    val out = AsofJoin.asofJoin(t, t, "k", "ts", "ts", Seq("v"))
      .select($"v", $"asof.v".as("av")).collect()
    out.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("asof join plans with a single shuffle on the key") {
    val df = AsofJoin.lastPurchaseAsof(spark, TestSpark.Sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // one Exchange for the (key)-window; the final ORDER BY adds a range
    // exchange — but there must be NO join-shaped exchange pair and no
    // BroadcastNestedLoopJoin/CartesianProduct anywhere
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges === 1, s"expected exactly 1 hash exchange:\n$plan")
    assert(df.count() > 0)
  }
}
