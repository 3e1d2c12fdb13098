package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Joins

/** FastSS deletion-neighborhood join vs the brute-force ground truth. */
class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  test("deletion-neighborhood join equals the exhaustive levenshtein cross join") {
    val got = Joins.fuzzyNameJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // ground truth: every (dirty, master) pair at lev <= 1, no blocking
    val dirty = Tables.customer(spark, dir)
      .where(col("c_custkey") % 3 === 1)
      .select(col("c_custkey").as("d_id"),
        expr("""concat(substring(c_name, 1, (c_custkey % (length(c_name) - 2)) + 1),
               |       substring(c_name, (c_custkey % (length(c_name) - 2)) + 3,
               |                 length(c_name)))""".stripMargin).as("d_name"))
    val master = Tables.customer(spark, dir)
      .select(col("c_custkey").as("m_id"), col("c_name").as("m_name"))
    val truth = dirty.crossJoin(master)
      .where(levenshtein(col("d_name"), col("m_name")) <= 1)
      .select(col("d_id"), col("m_id"),
        levenshtein(col("d_name"), col("m_name")).cast("long").as("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === truth)
    // every dirty record recovers its own master at distance exactly 1
    val own = got.filter { case (d, m, _) => d == m }
    assert(own.size === dirty.count())
    assert(own.forall(_._3 === 1L))
  }
}
