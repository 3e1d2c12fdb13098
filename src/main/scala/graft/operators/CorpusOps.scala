package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Corpus-preparation operators a large-scale training-data pipeline
  * runs between ingest (the reference's CDC surface) and training:
  * PII scrubbing, document chunking, deterministic sampling, and
  * token-budget shard packing.
  *
  * Scale design: every operator here is a single narrow projection or a
  * partitioned window — no joins, no driver state — so each runs in one
  * pass over the corpus and parallelizes with the number of executors.
  * Determinism design: sampling and chunk identity derive from md5 (same
  * bits on every engine), never from `rand()` or engine-native hashes, so
  * the same corpus always yields the same sample/chunks — a rerun of a
  * 100 TB preparation job must be reproducible to be debuggable.
  */
object CorpusOps {

  /** Phone numbers in the customer profile format `25-989-741-2988`. */
  val PhoneRegex = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Email-shaped tokens (none occur in the synthetic corpus, but a PII
    * pass always carries the full pattern set). */
  val EmailRegex = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** x_pii_scrub — redact personally identifiable substrings from a
    * free-text profile, keeping an audit count of redactions.
    * Generalizes the reference's boundary transform (AttributeValue
    * decode / Decimal re-encode at
    * `write_dynamodb_stream_to_s3_lambda/handler.py:15-19`) into the
    * content-safety transform a training pipeline needs. One codegen'd
    * projection; regexp_replace replaces every match.
    *
    * The testdata customer table carries no phone/email columns, so the
    * profile derives them deterministically from the key columns (the
    * same way TPC-H dbgen derives c_phone from the nation key): every
    * customer gets a phone, even keys also get an email — so the scrub
    * must handle 1- and 2-redaction rows. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        concat_ws(" ",
          col("c_name"),
          format_string("%02d-%03d-%03d-%04d",
            col("c_nationkey") + 10, col("c_custkey") % 1000,
            (col("c_custkey") * 7) % 1000, (col("c_custkey") * 31) % 10000),
          when(col("c_custkey") % 2 === 0,
            concat(lit("customer"), col("c_custkey"), lit("@example.com"))),
          col("c_mktsegment")).as("profile"))
      .select(
        col("c_custkey"),
        regexp_replace(
          regexp_replace(col("profile"), PhoneRegex, "[PHONE]"),
          EmailRegex, "[EMAIL]").as("redacted"),
        (size(regexp_extract_all(col("profile"), lit(PhoneRegex), lit(0))) +
          size(regexp_extract_all(col("profile"), lit(EmailRegex), lit(0))))
          .cast(LongType).as("n_redactions"))
      .orderBy(col("c_custkey"))

  /** x_chunk_pack — split each document into overlapping fixed-size token
    * windows (`chunkSize` tokens every `stride`), the standard chunking
    * step before embedding/training. Output is the chunk's token count
    * and md5 fingerprint (stable, compact) rather than the chunk text.
    * explode(sequence(...)) keeps it one Generate + projection — no
    * shuffle at all; chunk identity is reproducible across engines. */
  def chunkTokenWindows(spark: SparkSession, dir: String,
      chunkSize: Int = 64, stride: Int = 48): DataFrame = {
    val toks = split(col("text"), " ")
    Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)),
          lit(stride))).as("start"))
      .select(
        col("doc_id"),
        (col("start") / stride).cast(LongType).as("chunk_id"),
        least(lit(chunkSize), size(col("toks")) - col("start"))
          .cast(LongType).as("chunk_tokens"),
        md5(concat_ws(" ", slice(col("toks"), col("start") + 1, lit(chunkSize))))
          .as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** x_sample_stratified — deterministic stratified sampling: keep a
    * per-language fraction of documents chosen by the first two hex chars
    * of md5(doc_id) (256 equal-probability buckets). No rand(), no
    * engine-native hash — the SAME documents are kept on every engine and
    * every rerun, and the sample composition is tunable per stratum (the
    * up/down-sampling mix every training-data recipe specifies). */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    // en is over-represented in the corpus: keep 25% of it, 50% of the
    // rest ('40' = 64/256, '80' = 128/256 as lexicographic hex bounds)
    val bound = when(col("lang") === "en", lit("40")).otherwise(lit("80"))
    Tables.documents(spark, dir)
      .withColumn("h2", substring(md5(col("doc_id").cast(StringType)), 1, 2))
      .filter(col("h2") < bound)
      .select(col("doc_id"), col("lang"), col("h2"))
      .orderBy(col("doc_id"))
  }

  /** x_sample_exact_k — EXACTLY k documents per stratum, uniform without
    * replacement, deterministic: rank by md5(doc_id) within each
    * language and keep the k smallest hashes. [[sampleStratified]]'s
    * hash-Bernoulli keeps a FRACTION (binomial count per stratum);
    * eval/holdout set construction needs fixed SIZES — and the hash
    * ranking gives the prefix property for free (the k=10 sample is a
    * subset of the k=25 sample, so growing a holdout never resamples).
    * Scale: rides [[graft.functions.TopKAggregator]]'s bounded heap —
    * ≤ k rows per stratum per partition cross the shuffle, vs a window
    * row_number() sorting the whole corpus ("pick 10k eval docs" at
    * 100 TB must not sort 100 TB). */
  def sampleExactK(spark: SparkSession, dir: String, k: Int = 25): DataFrame = {
    import spark.implicits._
    val agg = new graft.functions.TopKAggregator(k)
    Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"),
        // 15 hex chars = 60 bits, positive; negate so the max-oriented
        // heap keeps the SMALLEST hashes (score DESC ≡ hash ASC)
        (-conv(substring(md5(col("doc_id").cast(StringType)), 1, 15),
          16, 10).cast(LongType)).as("score"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .agg(agg.toColumn.name("topk"))
      .toDF("lang", "topk")
      .select(col("lang"), posexplode(col("topk")))
      .select(col("lang"), (col("pos") + 1).cast(LongType).as("rank"),
        col("col._2").as("doc_id"))
      .orderBy(col("lang"), col("rank"))
  }

  /** x_domain_cap — per-SOURCE document cap, quality-ordered: keep at
    * most k documents per source, the BEST first (longest here — the
    * cheap quality proxy; any integer score drops in), doc_id breaking
    * ties. The C4/RefinedWeb-style per-domain cap: without it a single
    * crawler-friendly domain dominates the mix, and the cap must keep
    * the domain's best documents, not a uniform sample — which is what
    * separates this from [[sampleExactK]]'s hash ranking (uniform;
    * holdouts) vs this quality ranking (curation; caps). Same bounded-
    * heap scale shape: ≤ k rows per source per partition cross the
    * shuffle ("cap every domain at 10k docs" over 100 TB must not sort
    * 100 TB — a window row_number() would). */
  def domainCap(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    import spark.implicits._
    val agg = new graft.functions.TopKAggregator(k)
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), col("n_chars").as("score"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .agg(agg.toColumn.name("topk"))
      .toDF("source", "topk")
      .select(col("source"), posexplode(col("topk")))
      .select(col("source"), (col("pos") + 1).cast(LongType).as("rank"),
        col("col._2").as("doc_id"), col("col._1").as("n_chars"))
      .orderBy(col("source"), col("rank"))
  }

  /** x_embed_quantize — int8 absmax quantization of the embedding
    * column: per-vector scale = max |x|, each element → round(x/scale·127)
    * ∈ [-127, 127]. The standard 4× storage/bandwidth compression for a
    * 100 TB embedding store (and the format ANN indexes serve from).
    * Output exploded to (vec_id, pos, q) + the per-vector scale — flat
    * rows hash stably cross-engine. Determinism: float→double promotion
    * is exact, abs/max are exact, one divide + floor(+0.5) rounding —
    * no transcendentals, so bit-identical on every engine. */
  def embedQuantize(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .withColumn("scale",
        array_max(transform(col("embedding"),
          x => abs(x.cast(DoubleType)))))
      .select(col("vec_id"), col("scale"),
        posexplode(col("embedding")).as(Seq("pos0", "x")))
      .select(
        col("vec_id"),
        (col("pos0") + 1).cast(LongType).as("pos"),
        col("scale"),
        when(col("scale") === 0.0, lit(0L))
          .otherwise(floor(col("x").cast(DoubleType) / col("scale") * 127.0
            + 0.5).cast(LongType)).as("q"))
      .orderBy(col("vec_id"), col("pos"))

  /** x_pack_budget — assign documents to training shards by cumulative
    * token RANGE: within each language, docs in doc_id order are cut into
    * shards of `budget` cumulative tokens — shard = floor(exclusive
    * cumsum / budget), so a shard may span a doc boundary and hold up to
    * budget + maxdoc − 1 tokens (range sharding, NOT greedy bin packing:
    * greedy's running remainder has no closed form, while this is one
    * partitioned window — one shuffle on lang, linear within partitions,
    * and consumers that need a hard cap size their context window with
    * the known max-doc slack). */
  def packBudget(spark: SparkSession, dir: String,
      budget: Int = 2048): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
      .withColumn("shard",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / budget)
          .cast(LongType))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("shard"))
      .orderBy(col("doc_id"))
  }

  /** The deterministic held-out "benchmark" slice used by
    * [[decontaminate]]: every 97th doc_id. A real pipeline supplies its
    * eval sets here; the fixture needs a self-contained stand-in, and a
    * fixed arithmetic slice keeps the query (and its oracle)
    * reproducible. */
  val EvalSliceMod = 97L

  /** x_decontaminate — benchmark decontamination, the corpus-curation
    * step every training pipeline runs so eval data never leaks into
    * training data: for each training document, how many of its
    * distinct 3-gram shingles also occur in the held-out benchmark
    * set, and a flag once the overlap reaches `minOverlap` shingles
    * (the n-gram-collision decontamination rule of the C4/GPT-3
    * lineage, expressed over the same shingle domain as the dedup
    * family).
    *
    * Scale shape: a benchmark set is SMALL by nature (eval suites are
    * thousands of docs, the corpus is billions), so its distinct
    * shingle set is the broadcast side; the corpus side is one explode
    * + broadcast left-join + per-doc partial aggregation — the corpus
    * text is never shuffled, and the only shuffle carries 3 longs per
    * doc. Docs shorter than the shingle width have no shingles and no
    * row (same convention as the LM stats); benchmark docs themselves
    * are excluded from the output. */
  def decontaminate(spark: SparkSession, dir: String,
      minOverlap: Int = 8): DataFrame =
    decontaminateOf(
      Tables.documents(spark, dir).filter(col("doc_id") % EvalSliceMod =!= 0),
      benchmarkShingles(spark, dir), minOverlap)

  /** Per-doc DISTINCT hashed 3-shingles. Overlap COUNTING never needs
    * the shingle string back — hash each shingle to 8 bytes before the
    * distinct and the broadcast join (the x_lm_score trade; a
    * corpus-shingle × benchmark-shingle 64-bit collision is
    * ~|corpus|·|benchmark|/2^64, negligible). Hashes come from the
    * codegen'd [[graft.functions.TokenWindowHash]] — one O(n) byte pass
    * per doc, no shingle string materialized (the interpreted HOF form
    * was the query's dominant cost). */
  private def hashedShingles(docs: DataFrame): DataFrame = {
    import graft.functions.TokenWindowHash.tokenWindowHashes
    docs.select(col("doc_id"),
      explode(array_distinct(tokenWindowHashes(col("text"), 3))).as("shash"))
  }

  /** The benchmark's distinct hashed shingle set — the broadcast-sized
    * reference artifact decontamination checks against (computed once
    * per eval-suite snapshot; the streaming face pins it at stream
    * start). */
  def benchmarkShingles(spark: SparkSession, dir: String): DataFrame =
    benchmarkShinglesOf(
      Tables.documents(spark, dir).filter(col("doc_id") % EvalSliceMod === 0))

  /** [[benchmarkShingles]] over an explicit eval-doc frame (test
    * fixtures, alternate eval suites). */
  def benchmarkShinglesOf(evalDocs: DataFrame): DataFrame =
    hashedShingles(evalDocs).select(col("shash")).distinct()

  /** [[decontaminate]]'s core over explicit inputs — shared by the
    * whole-corpus batch face and the per-micro-batch ingest face
    * ([[graft.streaming.StreamingDecontaminate]]): the op is per-doc
    * stateless given the benchmark set, which is what makes the
    * streamed epochs tile the batch result exactly. */
  def decontaminateOf(trainDocs: DataFrame, evalShingles: DataFrame,
      minOverlap: Int = 8): DataFrame =
    hashedShingles(trainDocs)
      .join(broadcast(evalShingles.withColumn("hit", lit(1L))),
        Seq("shash"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") >= minOverlap)
      .orderBy(col("doc_id"))

  /** x_decontaminate_bloom — the BLOOM-PREFILTERED scale path of
    * [[decontaminate]], result-identical by construction (spec-pinned
    * and independently oracled): build a ~10-bit-per-key Bloom filter
    * over the benchmark shingle hashes ([[graft.functions.BloomFilters]]
    * — Spark's own runtime-filter expressions), prune each document's
    * candidate shingles against it INSIDE the array (before the
    * explode), and verify only the survivors against the exact set.
    *
    * Why this is the 100 TB face: the exact face broadcasts the
    * benchmark shingle set as a hashed relation (~tens of bytes/key —
    * fine for eval suites, gone at 10⁹ reference keys); the filter
    * costs 1.44·log₂(1∕fpp) bits/key (~1.2 GB at 10⁹ keys, 1% fpp), and
    * exactness survives because Bloom admits false POSITIVES only: the
    * verify join sees (true hits + fpp·candidates) rows instead of
    * every corpus shingle, so it is cheap in EITHER strategy — still
    * broadcast here, a survivor-sized shuffle join when the reference
    * set outgrows broadcast. Clean docs contribute one null-key row
    * each (explode_outer), which no join strategy matches and AQE can
    * split if the null partition skews. One corpus scan total; the
    * per-doc denominator (n_shingles) is computed map-side from the
    * array length, not from the join. */
  def decontaminateBloom(spark: SparkSession, dir: String,
      minOverlap: Int = 8, fpp: Double = 0.01): DataFrame =
    decontaminateBloomOf(
      Tables.documents(spark, dir).filter(col("doc_id") % EvalSliceMod =!= 0),
      benchmarkShingles(spark, dir), minOverlap, fpp)

  /** [[decontaminateBloom]]'s core over explicit inputs (mirrors
    * [[decontaminateOf]]): builds the filter, then delegates to
    * [[decontaminateBloomWith]]. */
  def decontaminateBloomOf(trainDocs: DataFrame, evalShingles: DataFrame,
      minOverlap: Int = 8, fpp: Double = 0.01): DataFrame = {
    // materialize the eval shingle relation ONCE (r19, guide §1.2): it
    // is consumed three times per call — the filter-sizing count, the
    // bloom build aggregation, and the exact-verify join — and each
    // consumer re-ran the eval-slice shingle pipeline. LAZY: the
    // sizing count inside buildEvalBloom materializes it.
    val ev = evalShingles.localCheckpoint(false, graft.ops.Pin.Level)
    decontaminateBloomWith(trainDocs, ev, buildEvalBloom(ev, fpp), minOverlap)
  }

  /** Build the benchmark-set Bloom filter once — the reference artifact
    * a streaming ingest pins at stream start next to the exact shingle
    * set ([[graft.streaming.StreamingDecontaminate]]), instead of
    * rebuilding it per micro-batch. */
  def buildEvalBloom(evalShingles: DataFrame, fpp: Double = 0.01): Array[Byte] = {
    import graft.functions.BloomFilters
    // the reference side is the SMALL side by nature; one count sizes
    // the filter (Spark's runtime-filter injection does the same from
    // plan statistics)
    val nEval = evalShingles.count()
    BloomFilters.buildBloom(evalShingles, "shash", math.max(1L, nEval), fpp)
  }

  /** The bloom-prefiltered check under an ALREADY-BUILT filter — shared
    * by the whole-corpus face and the per-micro-batch ingest face
    * (per-doc stateless given (filter, exact set), so streamed epochs
    * tile the batch result exactly, the decontaminateOf argument). */
  def decontaminateBloomWith(trainDocs: DataFrame, evalShingles: DataFrame,
      bloom: Array[Byte], minOverlap: Int = 8): DataFrame = {
    import graft.functions.BloomFilters
    import graft.functions.TokenWindowHash.tokenWindowHashes
    val sh = trainDocs.select(col("doc_id"),
        array_distinct(tokenWindowHashes(col("text"), 3)).as("shs"))
      .filter(size(col("shs")) > 0)
    val pre = sh.select(col("doc_id"),
      size(col("shs")).cast(LongType).as("n_shingles"),
      explode_outer(filter(col("shs"),
        h => BloomFilters.mightContain(bloom, h))).as("shash"))
    pre.join(evalShingles.withColumn("hit", lit(1L)), Seq("shash"), "left")
      .groupBy(col("doc_id"))
      .agg(max(col("n_shingles")).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") >= minOverlap)
      .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
        col("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** Target language shares of the training mix in integer PERCENT
    * (sum 100) — the "data recipe" a pretraining run pins. Integer so
    * per-language budgets are exact in any engine (0.15·100000 floors
    * to 14999 in IEEE doubles; 100000·15/100 is 15000 everywhere). */
  val MixShares: Seq[(String, Long)] = Seq(
    "en" -> 50L, "de" -> 20L, "fr" -> 15L, "es" -> 10L, "zh" -> 5L)

  /** x_dataset_mix — assemble a token-budgeted training mix: each
    * language gets budget·share tokens, filled by docs in a
    * DETERMINISTIC md5-of-id order (an unbiased, engine-stable shuffle
    * — no rand()); a doc is kept while the language's running token
    * total BEFORE it is under its budget (so one doc may straddle the
    * boundary, same convention as pack_budget's shards). The
    * data-mixing step of a training pipeline, exactly: recipe in,
    * kept-doc list out, with the cumulative accounting exposed.
    *
    * Determinism/oracle: budgets are budget·pct/100 in LONG arithmetic,
    * the order key is md5 hex (total, engine-identical), the cumsum is
    * an integer window — every column exact cross-engine. Scale: one
    * window per language partition (keyed shuffle, per-partition sort);
    * the recipe table is a broadcast literal. */
  def datasetMix(spark: SparkSession, dir: String,
      budget: Long = 100000L): DataFrame = {
    import spark.implicits._
    val shares = MixShares.toDF("lang", "pct")
      .select(col("lang"),
        // `div` is exact LONG division for any budget; `/` would be
        // double division, exact only while budget·pct < 2^53
        expr(s"(${budget}L * pct) div 100L").as("lang_budget"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
        md5(col("doc_id").cast(StringType)).as("h"))
      .join(broadcast(shares), Seq("lang"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("kept", col("cum_before") < col("lang_budget"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("cum_before"), col("lang_budget"), col("kept"))
      .orderBy(col("doc_id"))
  }

  /** x_mix_temperature — TEMPERATURE-weighted sampling recipe from the
    * corpus itself (the standard multilingual/multi-source rebalancing:
    * sample language i with probability ∝ c_i^α, α < 1, so low-resource
    * slices are upweighted relative to their natural share). α is fixed
    * at 1/2: c^(1/2) = sqrt(c) is CORRECTLY ROUNDED in every engine,
    * unlike pow(c, α) for general α — and the weight normalization runs
    * in exact integer arithmetic (sqrt quantized to 2^-20 micro-units,
    * summed as longs, ratios by integer division), so every output
    * column is engine-exact without any tolerance. Output per language:
    * natural share, temperature-sampling share (both ppm), and the
    * boost factor in milli — the upweighting a curriculum applies.
    *
    * Scale: one partial+final agg over the corpus (counts only — text
    * never shuffles), then arithmetic over one row per language joined
    * against a 1-row broadcast of the totals. */
  def mixTemperature(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast(LongType)).as("n_tokens"))
      .withColumn("s",
        floor(sqrt(col("n_tokens").cast(DoubleType)) * lit(1048576.0))
          .cast(LongType))
    val totals = counts.agg(sum(col("s")).as("s_tot"),
      sum(col("n_tokens")).as("t_tot"))
    counts.crossJoin(broadcast(totals))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        expr("(n_tokens * 1000000L) div t_tot").as("natural_ppm"),
        expr("(s * 1000000L) div s_tot").as("samp_ppm"))
      .withColumn("boost_milli",
        expr("(samp_ppm * 1000L) div greatest(natural_ppm, 1L)"))
      .orderBy(col("lang"))
  }
}
