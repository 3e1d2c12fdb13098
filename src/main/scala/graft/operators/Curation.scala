package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** The curation FUNNEL — the composed keep/drop decision a training-data
  * pipeline actually ships, built from the filter families this library
  * already proves individually (the C4/Gopher/RefinedWeb curation recipe:
  * language-ID gate, cheap quality heuristics, repetition filter,
  * cross-document substring dedup, benchmark decontamination).
  *
  * The reference pipeline's analogue is its strict event-type gate before
  * warehouse load (`write_dynamodb_stream_to_s3_lambda/handler.py:27-37`):
  * one declared predicate decides what enters the corpus. Here the
  * predicate is five-stage and per-stage ATTRIBUTED — every dropped doc
  * reports the first stage that killed it, which is what a pipeline owner
  * tunes against (the per-stage attrition table is the headline artifact
  * of every curation ablation).
  *
  * Scale shape: stage flags come from the existing corpus-linear plans —
  * one narrow projection (lang + quality: zero shuffles), the bigram
  * repetition aggregation, the window-hash substring dedup (its occurrence
  * relation checkpointed once, the substringDedup convention), and the
  * broadcast-benchmark decontamination join. The compose step is three
  * LEFT joins keyed on doc_id carrying a handful of longs/booleans per doc
  * — at 100 TB each stage is the shuffle it already was, and the funnel
  * adds only doc_id-keyed flag joins (AQE picks broadcast when a stage
  * relation is small enough, e.g. repetition rows only for multi-token
  * docs).
  *
  * Decision semantics: dedup + decontamination are computed over the
  * TRAINING corpus (benchmark slice excluded, the decontaminate
  * convention) — a window shared only with a benchmark doc must count as
  * contamination, not duplication, so the substring stage's document
  * frequency deliberately excludes the eval slice.
  */
object Curation {

  /** Stage names in decision order — the order is part of the contract
    * (first_fail attribution depends on it): cheap narrow gates first,
    * corpus-global decisions last. */
  val Stages: Seq[String] =
    Seq("lang", "quality", "repetition", "substring_dup", "contamination")

  /** x_curation_funnel — per-document curation decision over the training
    * slice: one boolean per stage, the conjunction `keep`, and
    * `first_fail` naming the earliest failed stage ('none' for kept
    * docs). Thresholds are corpus tuning (documented at each stage's own
    * query); the RULE composition is the deliverable. */
  def funnel(spark: SparkSession, dir: String, minTokens: Int = 20,
      alphaPctMin: Int = 50): DataFrame =
    funnelOf(
      Tables.documents(spark, dir)
        .filter(col("doc_id") % CorpusOps.EvalSliceMod =!= 0),
      CorpusOps.benchmarkShingles(spark, dir), minTokens, alphaPctMin)

  /** [[funnel]] over explicit inputs — shared by the whole-corpus batch
    * face and the per-micro-batch ingest face
    * ([[graft.streaming.IncrementalCuration]]): the training docs and
    * the pinned benchmark shingle set are the only corpus-shaped
    * dependencies. */
  def funnelOf(train: DataFrame, evalShingles: DataFrame,
      minTokens: Int = 20, alphaPctMin: Int = 50): DataFrame =
    composeFlags(
      perDocFlags(train, minTokens, alphaPctMin),
      Dedup.substringFlagsFrom(
          Dedup.windowOccurrencesOf(train)
            .localCheckpoint(false, graft.ops.Pin.Level)) // lazy: r19
        .select(col("doc_id"), col("dup_heavy")),
      CorpusOps.decontaminateOf(train, evalShingles)
        .select(col("doc_id"), col("contaminated")))

  /** The funnel's per-doc-PURE stages — lang, quality, repetition — as
    * one relation: these depend only on the document itself, so the
    * ingest face appends them per micro-batch exactly (the postings /
    * occurrence-index argument). Lang + quality are one narrow
    * zero-shuffle projection; quality gates are in cross-multiplied
    * integer form (the x_repetition convention) so the decision never
    * touches a float near the boundary. */
  def perDocFlags(train: DataFrame, minTokens: Int = 20,
      alphaPctMin: Int = 50): DataFrame = {
    val base = train.select(
      col("doc_id"),
      (langGuess(col("text")) =!= "und").as("pass_lang"),
      (tokenCount(col("text")) >= minTokens &&
        size(regexp_extract_all(col("text"), lit("[A-Za-z]"), lit(0)))
          .cast("long") * 100L >= length(col("text")).cast("long") * alphaPctMin)
        .as("pass_quality"))
    val rep = TextAnalysis.repetitionStatsOf(train, sharePct = 10)
      .select(col("doc_id"), col("repetitive"))
    base.join(rep, Seq("doc_id"), "left")
  }

  /** Compose per-doc-pure flags with the two corpus-GLOBAL stage
    * relations (substring dup, contamination) into the funnel output —
    * the decision step both faces share. Docs too short for a stage's
    * n-gram domain have no stage row: absent ⇒ pass (they cannot be
    * repetitive/duplicated/contaminated at that granularity — the
    * per-stage queries' own convention). */
  private[graft] def composeFlags(base: DataFrame, sub: DataFrame,
      dec: DataFrame): DataFrame = {
    val flags = base
      .join(sub, Seq("doc_id"), "left")
      .join(dec, Seq("doc_id"), "left")
      .select(col("doc_id"), col("pass_lang"), col("pass_quality"),
        (!coalesce(col("repetitive"), lit(false))).as("pass_repetition"),
        (!coalesce(col("dup_heavy"), lit(false))).as("pass_substring_dup"),
        (!coalesce(col("contaminated"), lit(false))).as("pass_contamination"))
    val passCols = Stages.map(s => col(s"pass_$s"))
    flags
      .withColumn("keep", passCols.reduce(_ && _))
      .withColumn("first_fail",
        Stages.foldRight(lit("none")) { (s, acc) =>
          when(!col(s"pass_$s"), lit(s)).otherwise(acc)
        })
      .orderBy(col("doc_id"))
  }

  /** x_source_profile — the funnel rolled up per SOURCE: document/token
    * volume, kept count and per-stage kill counts for every source — the
    * "which sources are worth crawling" table (RefinedWeb/C4 curate
    * per-domain on exactly these numbers: a source whose docs die
    * overwhelmingly at one stage gets a source-level rule instead of
    * per-doc work). One doc_id-keyed join to attach (source, n_tokens),
    * then a per-source conditional-sum aggregation — grouping key
    * cardinality is the source vocabulary, far below doc count, so the
    * final shuffle is tiny; the map side pre-combines. */
  def sourceProfile(spark: SparkSession, dir: String): DataFrame =
    sourceProfileFrom(funnel(spark, dir), Tables.documents(spark, dir))

  /** [[sourceProfile]] over an explicit funnel + documents pair — the
    * skew-stress face (CurationIngestBench feeds it synthetic source
    * skews). Skew note: a hot source (80% of a crawl from one domain is
    * realistic) is absorbed by the partial+final aggregation — every
    * map task pre-combines its rows to ≤ one row per source before the
    * exchange, so the final shuffle carries ≤ sources × partitions tiny
    * rows no matter how skewed the input (PlanSpec pins the partial
    * agg; the ingest bench measures skewed ≈ uniform). No SkewOps
    * two-phase salt is needed — that treatment exists for aggregations
    * whose PER-GROUP state is large (exact distincts), not for
    * constant-size conditional sums like these. */
  def sourceProfileFrom(f: DataFrame, docs: DataFrame): DataFrame = {
    val meta = docs
      .select(col("doc_id"), col("source"),
        tokenCount(col("text")).as("n_tokens"))
    f.join(meta, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        (Seq(
          sum(col("n_tokens")).as("n_tokens"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept")) ++
        Stages.map(s =>
          sum(when(col("first_fail") === s, 1L).otherwise(0L))
            .as(s"killed_$s"))): _*)
      .orderBy(col("source"))
  }

  /** x_curation_attrition — the funnel's per-stage summary: how many docs
    * failed AT each stage (first_fail attribution) and how many survive
    * THROUGH it. The heavy work is [[funnel]]'s; this adds one ≤6-group
    * aggregation and a 5-row stage axis — the single-partition window
    * over it is 5 rows by construction. */
  def attrition(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val f = funnel(spark, dir)
    val failed = f.groupBy(col("first_fail"))
      .agg(count(lit(1)).as("failed_here"))
    val stages = Stages.zipWithIndex
      .map { case (s, i) => (s, (i + 1).toLong) }
      .toDF("stage", "stage_no")
    val total = f.agg(count(lit(1)).as("n_input"))
    stages
      .join(failed, stages("stage") === failed("first_fail"), "left")
      .crossJoin(broadcast(total))
      .select(col("stage"), col("stage_no"),
        coalesce(col("failed_here"), lit(0L)).as("failed_here"),
        col("n_input"))
      .withColumn("survivors",
        col("n_input") - sum(col("failed_here"))
          .over(Window.orderBy(col("stage_no"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("n_input")
      .orderBy(col("stage_no"))
  }
}
