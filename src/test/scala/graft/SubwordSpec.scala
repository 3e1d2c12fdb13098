package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SubwordCount
import graft.operators.Subword

/** Subword tokenization: the greedy longest-match encode against
  * hand-computed cases and a brute-force reference, codegen ≡
  * interpreted, deterministic vocab training, and the per-doc query
  * face's integer invariants. */
class SubwordSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  private def refCount(w: String, vocab: Set[String], maxLen: Int): Long = {
    var pos = 0; var toks = 0L
    while (pos < w.length) {
      val l = (math.min(maxLen, w.length - pos) to 2 by -1)
        .find(n => vocab.contains(w.substring(pos, pos + n))).getOrElse(1)
      toks += 1; pos += l
    }
    toks
  }

  test("greedy longest-match: hand cases + single-char membership is " +
      "count-irrelevant") {
    val set = new java.util.HashSet[String]()
    Seq("hell", "he", "lo", "ll").foreach(set.add)
    import org.apache.spark.unsafe.types.UTF8String
    def c(w: String) = SubwordCount.count(UTF8String.fromString(w), set, 5)
    // hello: hell + o(unk-char) = 2
    assert(c("hello") === 2L)
    // hehe: he + he
    assert(c("hehe") === 2L)
    // lull: l(unk) + u(unk) + ll = 3 — greedy takes ll at pos 2
    assert(c("lull") === 3L)
    // empty word: zero tokens
    assert(c("") === 0L)
    // chars absent from vocab advance 1 per char
    assert(c("xyz") === 3L)
  }

  test("expression ≡ brute-force reference on corpus words; codegen " +
      "path active") {
    import spark.implicits._
    val vocab = Subword.ensureVocab(spark, dir)
    val vset = vocab.toSet
    val words = Tables.documents(spark, dir)
      .select(explode(regexp_extract_all(col("text"), lit("[A-Za-z]+"), lit(0))).as("w"))
      .select(lower(col("w")).as("w")).distinct().as[String].collect()
    assert(words.nonEmpty)
    val got = spark.createDataset(words.toSeq).toDF("w")
      .select(col("w"),
        SubwordCount.subwordCount(col("w"), vocab, Subword.MaxTokenLen).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach { w =>
      assert(got(w) === refCount(w, vset, Subword.MaxTokenLen),
        s"mismatch on '$w'")
    }
  }

  test("vocab training is deterministic and bounded; query face " +
      "invariants hold for every doc") {
    val v1 = Subword.vocabFrame(spark, dir).collect().map(_.getString(0))
    val v2 = Subword.vocabFrame(spark, dir).collect().map(_.getString(0))
    assert(v1.toSeq === v2.toSeq, "vocab must be deterministic")
    assert(v1.length <= Subword.VocabSize)
    assert(v1.distinct.length === v1.length)
    val q = Subword.subwordTokenize(spark, dir)
    // plan audit: encode is ONE narrow codegen'd pass — the vocab is
    // expression state, so the only exchanges are the per-doc agg and
    // the output sort; no join anywhere
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("subword_count"), p)
    assert(!p.contains("Join"), "encode must not join against the vocab")
    assert("Exchange (hash|range)partitioning".r.findAllIn(p).size === 2, p)
    assert(p.contains("partial_count"), p)
    val rows = q.collect()
    val nDocs = Tables.documents(spark, dir).count()
    assert(rows.length.toLong === nDocs, "every doc must appear")
    rows.foreach { r =>
      val (w, s) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_subwords"))
      assert(s >= w, s"subwords >= words violated for doc ${r.get(0)}")
      assert(w >= 0L && s >= 0L)
    }
  }
}
