package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis queries over the documents table (driver mandate:
  * language-ID, quality scoring, token counting, fingerprinting).
  * All pure projections/aggregations — each is a single pass, fully
  * codegen'd, no UDF. */
object TextAnalysis {

  /** x_text_tokenize_counts — global word frequencies, top-k.
    * explode → groupBy: partial aggregation means the shuffle carries
    * (word, partial_count), not one row per token occurrence. */
  def tokenizeCounts(spark: SparkSession, dir: String, k: Int = 50): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(k)

  /** x_token_stats — per-document token counting: whitespace tokens and
    * BPE-ish regex tokens (marks split out), plus char length. */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        tokenCount(col("text")).as("n_ws_tokens"),
        regexTokenCount(col("text")).as("n_re_tokens"),
        length(col("text")).cast(LongType).as("n_chars_actual"))
      .orderBy(col("doc_id"))

  /** x_text_quality — cheap quality heuristics: length, average token
    * length, stopword ratio, alpha ratio. round2 keeps the ratios
    * cross-engine hashable. */
  def textQuality(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        graft.functions.DetMath.round2(avgTokenLen(col("text"))).as("avg_token_len"),
        graft.functions.DetMath.round2(stopwordRatio(col("text"))).as("stopword_ratio"),
        graft.functions.DetMath.round2(alphaRatio(col("text"))).as("alpha_ratio"))
      .orderBy(col("doc_id"))

  /** x_lang_id — stopword-vote language guess vs the labeled lang column
    * (accuracy is a data property, not asserted; the operator is the
    * deliverable). */
  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        col("lang").as("lang_labeled"),
        langGuess(col("text")).as("lang_guess"))
      .orderBy(col("doc_id"))

  /** x_doc_fingerprint — md5-based 64-bit content fingerprints (the
    * cross-engine-stable dedup key; see also the rolling-hash Catalyst
    * expression in graft.functions). */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  /** x_rolling_fingerprint — winnowing-style min-window rolling-hash
    * fingerprints (shift-stable, unlike md5 of the whole text) via the
    * codegen'd [[graft.functions.RollingFingerprint]] expression.
    * DuckDB-oracled since round 6: the hash is a portable polynomial
    * mod-2^64 formula the oracle replays in HUGEINT arithmetic;
    * scalatest additionally checks the rolling invariants. */
  def rollingFingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.RollingFingerprint.rollingFingerprint(col("text"), 32)
          .as("rfp"))
      .orderBy(col("doc_id"))
}
