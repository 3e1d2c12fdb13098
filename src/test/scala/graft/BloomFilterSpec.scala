package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.BloomFilters
import graft.operators.CorpusOps

/** Bloom build/probe on Spark's runtime-filter expressions, and the
  * bloom-prefiltered decontamination face (round 10). */
class BloomFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  test("bloom probe: no false negatives ever; false-positive rate near spec") {
    import spark.implicits._
    val inserted = (0L until 5000L).map(k => k * 2654435761L + 17L)
    val bloom = BloomFilters.buildBloom(inserted.toDF("v"), "v", 5000L, 0.01)
    // EVERY inserted key must probe true — Bloom's one hard guarantee,
    // and the property the decontaminate equivalence rests on
    val misses = inserted.toDF("v")
      .filter(!BloomFilters.mightContain(bloom, col("v"))).count()
    assert(misses === 0L, s"$misses false negatives — bloom is broken")
    // disjoint probe set: fp rate should be ~1%, generously bounded
    val probes = (0L until 20000L).map(k => k * 906488411L + 3L)
      .filterNot(inserted.toSet)
    val fps = probes.toDF("v")
      .filter(BloomFilters.mightContain(bloom, col("v"))).count()
    assert(fps < probes.size * 0.05,
      s"fp rate ${fps.toDouble / probes.size} far above configured 1%")
  }

  test("bloom sizing: optimal-bits formula behaves") {
    // 1% fpp ≈ 9.6 bits/key, 0.1% ≈ 14.4
    assert(math.abs(BloomFilters.optimalNumBits(1000000L, 0.01) / 1e6 - 9.585) < 0.01)
    assert(math.abs(BloomFilters.optimalNumBits(1000000L, 0.001) / 1e6 - 14.378) < 0.01)
    intercept[IllegalArgumentException](BloomFilters.optimalNumBits(0L, 0.01))
    intercept[IllegalArgumentException](BloomFilters.optimalNumBits(10L, 1.5))
  }

  test("bloom build above the optimizer's 4M-item cap; confs restored after") {
    // BloomFilterAggregate's analysis check enforces
    // spark.sql.optimizer.runtime.bloomFilter.maxNumItems (4M) — sized
    // for Catalyst's automatic runtime filters, not for an explicit
    // 10⁹-key reference set. buildBloom raises the caps for the build
    // and must restore them after.
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val before = spark.conf.getOption(itemsKey)
    val df = spark.range(5000000L).selectExpr("id * 2654435761 as v")
    val bloom = BloomFilters.buildBloom(df, "v", 5000000L, 0.01)
    assert(bloom.length * 8L >= BloomFilters.optimalNumBits(5000000L, 0.01) / 2,
      "filter far smaller than requested — caps likely clamped it")
    import spark.implicits._
    val misses = Seq(0L, 2654435761L, 4999999L * 2654435761L).toDF("v")
      .filter(!BloomFilters.mightContain(bloom, org.apache.spark.sql.functions.col("v")))
      .count()
    assert(misses === 0L)
    assert(spark.conf.getOption(itemsKey) === before, "conf not restored")
  }

  test("x_decontaminate_bloom ≡ x_decontaminate row-for-row") {
    val exact = CorpusOps.decontaminate(spark, dir).collect().map(_.toSeq)
    val bloom = CorpusOps.decontaminateBloom(spark, dir).collect().map(_.toSeq)
    assert(exact.nonEmpty && bloom.length === exact.length)
    bloom.zip(exact).foreach { case (b, e) => assert(b === e) }
  }

  test("bloom face: the probe sits in the plan, inside the array prune") {
    val plan = CorpusOps.decontaminateBloom(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "bloom probe missing from the physical plan")
  }

  test("equivalence survives an adversarial fpp (bloom saturated with false positives)") {
    import spark.implicits._
    // tiny filter + high fpp: nearly everything bloom-passes, so the
    // verify join is doing all the work — results must STILL be exact
    val docs = Seq(
      (1L, "a b c d e f g"), (2L, "c d e h i j k"), (3L, "x y z w v u t"),
      (97L * 1, "a b c d e q r")).toDF("doc_id", "text")
    val train = docs.filter(col("doc_id") % CorpusOps.EvalSliceMod =!= 0)
    val eval_ = CorpusOps.benchmarkShinglesOf(
      docs.filter(col("doc_id") % CorpusOps.EvalSliceMod === 0))
    val exact = CorpusOps.decontaminateOf(train, eval_, minOverlap = 2)
      .collect().map(_.toSeq)
    val loose = CorpusOps.decontaminateBloomOf(train, eval_,
      minOverlap = 2, fpp = 0.5).collect().map(_.toSeq)
    assert(loose.toSeq === exact.toSeq)
  }
}
