package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.RollingFingerprint
import graft.functions.RollingFingerprint.rollingFingerprint

/** Rolling-hash fingerprint invariants. */
class RollingFingerprintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fp(s: String, w: Int = 8): Long =
    Seq(s).toDF("t").select(rollingFingerprint(col("t"), w)).collect().head.getLong(0)

  test("matches a direct recomputation (rolling update is correct)") {
    val s = "the quick brown fox jumps over the lazy dog"
    val bytes = s.getBytes("UTF-8")
    val w = 8
    // brute force: hash every window from scratch
    val brute = (0 to bytes.length - w).map { i =>
      bytes.slice(i, i + w).foldLeft(0L)((h, b) => h * RollingFingerprint.P + (b & 0xffL))
    }.min
    assert(fp(s, w) === brute)
  }

  test("shift-stable: prepending a header usually keeps the fingerprint") {
    val body = "x" * 3 + "the quick brown fox jumps over the lazy dog and runs away"
    assert(fp("HEADER: " + body) === fp("OTHER " + body))
  }

  test("content-sensitive: different bodies give different fingerprints") {
    assert(fp("completely different document body here") !==
      fp("the quick brown fox jumps over the lazy dog"))
  }

  test("short strings and empty strings are defined") {
    assert(fp("", 8) === 0L)
    assert(fp("ab", 8) === "ab".getBytes("UTF-8")
      .foldLeft(0L)((h, b) => h * RollingFingerprint.P + (b & 0xffL)))
  }

  test("query surface is deterministic across runs") {
    val a = operators.TextAnalysis.rollingFingerprints(spark, TestSpark.Sf0001).collect()
    val b = operators.TextAnalysis.rollingFingerprints(spark, TestSpark.Sf0001).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    assert(a.nonEmpty)
  }
}
