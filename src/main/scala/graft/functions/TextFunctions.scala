package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis building blocks for the training-data pipeline extension
  * (SURVEY §2.B group X; driver mandate: language-ID, quality scoring,
  * token counting, fingerprinting).
  *
  * Everything here is a pure `Column → Column` built from codegen'd
  * built-ins and higher-order functions — no UDFs, so the whole pipeline
  * stays inside WholeStageCodegen and scales linearly with executors.
  */
object TextFunctions {

  /** Whitespace tokens (keeps empties, mirroring a raw `split(' ')` —
    * the reference's own normalization is equally literal, see
    * `/root/reference/source/load_data_to_rds_lambda/handler.py:24-27`). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokens: letter runs, digit runs, or single
    * non-alphanumeric marks — the classic pre-tokenizer split. */
  val TokenRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def regexTokens(text: Column): Column = regexp_extract_all(text, lit(TokenRegex), lit(0))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast(LongType)

  /** Regex (BPE-ish) token count. */
  def regexTokenCount(text: Column): Column = size(regexTokens(text)).cast(LongType)

  /** Word n-gram shingles: overlapping windows of `n` tokens joined by a
    * space. `transform` over an index sequence keeps it codegen-friendly;
    * empty/short docs yield an empty array. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array().cast(ArrayType(StringType)))
      .otherwise(
        transform(
          sequence(lit(1), size(toks) - lit(n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Distinct shingle set (for Jaccard / MinHash). */
  def shingleSet(text: Column, n: Int): Column = array_distinct(shingles(text, n))

  /** Content fingerprint: first 16 hex chars of md5 — stable across
    * engines, collision-safe enough for dedup bucketing at any corpus
    * size we care about (2^64 space). */
  def fingerprint(text: Column): Column = substring(md5(text), 1, 16)

  /** Portable 60-bit hash: the first 15 hex chars of md5 as a BIGINT.
    * Every engine with md5 reproduces it bit-for-bit (DuckDB:
    * hex-digit positions via strpos), which is what lets hash-derived
    * signatures (SimHash) be DuckDB-oracled — xxhash64 is Spark-native
    * and would close that door. 15 chars (not 16) so the value fits a
    * SIGNED 64-bit integer in both engines. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Quality-score feature columns (length / punctuation / stopword
    * ratios — the standard cheap text-quality heuristics). */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    size(filter(toks, t => t.isin(Stopwords.map(s => lit(s)): _*))).cast(DoubleType) /
      greatest(size(toks), lit(1)).cast(DoubleType)
  }

  def alphaRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]"), lit(0))).cast(DoubleType) /
      greatest(length(text), lit(1)).cast(DoubleType)

  def punctRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0))).cast(DoubleType) /
      greatest(length(text), lit(1)).cast(DoubleType)

  def avgTokenLen(text: Column): Column = {
    val toks = tokens(text)
    (length(text) - (size(toks) - lit(1))).cast(DoubleType) /
      greatest(size(toks), lit(1)).cast(DoubleType)
  }

  /** Language-ID by stopword-set voting: count DISTINCT marker words of
    * each language present in the document, take the argmax
    * (ties → lexicographically smallest language code). A real n-gram
    * profile model lives in scalatest-land; this is the SQL-expressible
    * core that scales as a single projection. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ein", "mit"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "pour", "que"),
    "zh" -> Seq("de5", "shi4", "bu4", "le5", "wo3", "you3", "zai4", "ta1"))

  def langScores(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    LangMarkers.map { case (lang, markers) =>
      lang -> size(array_intersect(toks, array(markers.map(lit): _*))).cast(LongType)
    }
  }

  /** Argmax language with deterministic tiebreak. */
  def langGuess(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
    // foldRight: earliest (lexicographically smallest) language wins ties
  }
}
