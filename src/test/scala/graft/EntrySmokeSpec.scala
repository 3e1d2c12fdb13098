package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() yields rows; every declared query runs
  * end-to-end at sf0.001; every oracleSql key has a matching query. */
class EntrySmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without query: $missing")
  }

  test("every query runs at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, TestSpark.Sf0001).count()
      withClue(name)(assert(n >= 0))
    }
  }

  test("queries that must be non-empty are non-empty") {
    val mustHaveRows = Seq("g_count_star", "g_group_agg", "j_multiway_star",
      "w_last_wins_dedup", "o_sort_limit", "x_exact_dedup",
      "x_text_tokenize_counts", "x_knn_cosine")
    mustHaveRows.foreach { name =>
      withClue(name)(
        assert(SparkEntry.queries(name)(spark, TestSpark.Sf0001).count() > 0))
    }
  }
}
