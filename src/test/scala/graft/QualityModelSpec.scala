package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.QualityModel

/** The trained quality model must EARN its place: the fixed-point GD
  * weights have to beat the trivial always-majority predictor, on the
  * full corpus and on the held-out %97 slice the trainer never saw. */
class QualityModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  test("trained classifier beats the majority-class base rate, held-out slice included") {
    val out = QualityModel.qualityClassifier(spark, dir)
      .localCheckpoint(true)
    val n = out.count()
    val correct = out.where(col("pred_pass") === col("label_pass")).count()
    val pos = out.where(col("label_pass")).count()
    val baseRate = math.max(pos, n - pos).toDouble / n
    val acc = correct.toDouble / n
    assert(acc > baseRate,
      f"model accuracy $acc%.3f must beat base rate $baseRate%.3f")
    assert(acc > 0.95, f"expected a strong fit on this corpus, got $acc%.3f")
    val heldOut = out.where(col("doc_id") % 97 === 0)
    val hoN = heldOut.count()
    val hoCorrect = heldOut
      .where(col("pred_pass") === col("label_pass")).count()
    assert(hoN > 0)
    assert(hoCorrect.toDouble / hoN > baseRate,
      s"held-out accuracy $hoCorrect/$hoN must beat base rate $baseRate")
  }

  test("training is deterministic and weights are non-trivial") {
    val w1 = QualityModel.train(spark, dir)
    val w2 = QualityModel.train(spark, dir)
    assert(w1.toSeq === w2.toSeq)
    assert(w1.exists(_ != 0L))
  }
}
