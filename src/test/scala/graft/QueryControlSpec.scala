package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.QueryControl

/** A16/A18: idempotent query start, status observation, graceful stop. */
class QueryControlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("startIfNotActive starts once, then no-ops while active (A18 state machine)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Int]
    var starts = 0
    def start() = {
      starts += 1
      input.toDF().writeStream.format("memory")
        .queryName("ctl_test").start()
    }
    val q1 = QueryControl.startIfNotActive(spark, "ctl_test")(start())
    val q2 = QueryControl.startIfNotActive(spark, "ctl_test")(start())
    try {
      assert(starts === 1)
      assert(q1.id === q2.id)
      input.addData(1, 2, 3)
      q1.processAllAvailable()
      val st = QueryControl.status(spark)
      assert(st.filter($"name" === "ctl_test" && $"active").count() === 1)
    } finally {
      assert(QueryControl.stopIfActive(spark, "ctl_test"))
      assert(!QueryControl.stopIfActive(spark, "ctl_test"))
    }
  }
}
