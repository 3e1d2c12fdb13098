package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CorpusOps, Curation, Dedup, TextAnalysis}

/** The curation funnel must be exactly the composition of its stage
  * queries: same per-doc verdicts as each standalone filter, first_fail
  * attribution in declared stage order, and an attrition summary whose
  * arithmetic closes (failed-per-stage + final survivors = input). */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  private lazy val funnel =
    Curation.funnel(spark, dir).collect().map { r =>
      r.getAs[Long]("doc_id") ->
        (Curation.Stages.map(s => r.getAs[Boolean](s"pass_$s")),
          r.getAs[Boolean]("keep"), r.getAs[String]("first_fail"))
    }.toMap

  test("funnel flags equal the standalone stage queries on the train slice") {
    val train = Tables.documents(spark, dir)
      .filter(col("doc_id") % CorpusOps.EvalSliceMod =!= 0)
    val lang = TextAnalysis.langId(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[String]("lang_guess") != "und")).toMap
    val rep = TextAnalysis.repetitionStatsOf(train, 10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("repetitive")).toMap
    val sub = Dedup.substringFlagsFrom(Dedup.windowOccurrencesOf(train)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("dup_heavy")).toMap
    val dec = CorpusOps.decontaminate(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("contaminated")).toMap
    val trainIds = train.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(funnel.keySet === trainIds)
    funnel.foreach { case (id, (passes, _, _)) =>
      assert(passes(0) === lang(id), s"lang @$id")
      assert(passes(2) === !rep.getOrElse(id, false), s"repetition @$id")
      assert(passes(3) === !sub.getOrElse(id, false), s"substring @$id")
      assert(passes(4) === !dec.getOrElse(id, false), s"contamination @$id")
    }
  }

  test("keep is the conjunction; first_fail is the FIRST failed stage in order") {
    funnel.values.foreach { case (passes, keep, firstFail) =>
      assert(keep === passes.forall(identity))
      val expected = Curation.Stages.zip(passes)
        .collectFirst { case (s, false) => s }.getOrElse("none")
      assert(firstFail === expected)
    }
    // the fixture must exercise the funnel: several distinct stages fire
    val firing = funnel.values.map(_._3).toSet - "none"
    assert(firing.size >= 2, s"only $firing stages fire — degenerate fixture")
    assert(funnel.values.exists(_._2), "no doc survives — degenerate thresholds")
  }

  test("attrition closes: failed_here matches first_fail counts, survivors telescope") {
    val att = Curation.attrition(spark, dir).collect()
      .map(r => (r.getAs[String]("stage"), r.getAs[Long]("stage_no"),
        r.getAs[Long]("failed_here"), r.getAs[Long]("survivors")))
    assert(att.map(_._1).toSeq === Curation.Stages)
    val failCounts = funnel.values.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val n = funnel.size.toLong
    var expectedSurvivors = n
    att.foreach { case (stage, _, failedHere, survivors) =>
      assert(failedHere === failCounts.getOrElse(stage, 0L), s"failed @$stage")
      expectedSurvivors -= failedHere
      assert(survivors === expectedSurvivors, s"survivors @$stage")
    }
    assert(att.last._4 === funnel.values.count(_._2).toLong)
  }

  test("source profile closes against the per-doc funnel joined to sources") {
    val srcOf = Tables.documents(spark, dir).select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val prof = Curation.sourceProfile(spark, dir).collect()
    val bySource = funnel.toSeq.groupBy { case (id, _) => srcOf(id) }
    assert(prof.map(_.getAs[String]("source")).toSet === bySource.keySet)
    prof.foreach { r =>
      val docs = bySource(r.getAs[String]("source")).map(_._2)
      assert(r.getAs[Long]("n_docs") === docs.size.toLong)
      assert(r.getAs[Long]("n_kept") === docs.count(_._2).toLong)
      Curation.Stages.foreach { s =>
        assert(r.getAs[Long](s"killed_$s") === docs.count(_._3 == s).toLong,
          s"killed_$s @${r.getAs[String]("source")}")
      }
    }
    // kill counts + kept = docs, per source
    prof.foreach { r =>
      val killed = Curation.Stages.map(s => r.getAs[Long](s"killed_$s")).sum
      assert(killed + r.getAs[Long]("n_kept") === r.getAs[Long]("n_docs"))
    }
  }
}
