package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Subword tokenization with a corpus-derived vocabulary — the real
  * token-counting model an LLM data pipeline budgets with (regex token
  * counts approximate it; training mixes are specified in SUBWORD
  * tokens). Two phases, both SQL-replayable so the whole operator is
  * hash-oracled end-to-end:
  *
  *  1. VOCAB TRAINING: word model = lowercased `[A-Za-z]+` runs; every
  *     substring of every distinct word up to [[MaxTokenLen]] chars is
  *     a candidate, scored by total corpus occurrences (word count ×
  *     positions — the WordPiece-style frequency objective, one rank
  *     pass instead of BPE's iterated merges: each BPE merge step is a
  *     full corpus-stats pass, so merge-count many sequential jobs at
  *     100 TB; the substring-rank objective needs exactly two shuffles
  *     TOTAL and stays deterministic under ties via (freq DESC, tok)).
  *     Top [[VocabSize]] survive. The candidate explode is bounded:
  *     |distinct words| × avg_len × maxLen rows of ≤5-char strings —
  *     distinct-word-sized, not corpus-sized.
  *  2. ENCODE: greedy longest-match per word via the codegen'd
  *     [[graft.functions.SubwordCount]] expression (vocab rides the
  *     task binary as an opaque reference object, the codebook
  *     pattern); per-doc totals by one partial+final aggregation.
  *
  * Scale shape: training touches the corpus once (word explode →
  * count), then works on the distinct-word relation; encode is one
  * narrow codegen'd pass over word occurrences with NO join — the
  * vocab is expression state, so the only shuffles are the per-doc agg
  * and the output sort. The vocabulary is persisted sig-gated beside
  * the other trained state (IVF centroids, PQ codebooks) and retrains
  * only when the corpus snapshot changes. */
object Subword {

  /** Vocabulary size — driver-bounded trained state (512 tokens ≈ the
    * toy-scale analog; the serving shape is identical at 32 k–100 k
    * entries, still KBs–MBs of expression state). */
  val VocabSize = 512

  /** Longest vocabulary token in characters. */
  val MaxTokenLen = 5

  /** Word occurrences per doc: lowercased `[A-Za-z]+` runs;
    * `explode_outer` keeps wordless docs as a null-word row so per-doc
    * aggregates cover every document. */
  private def wordOcc(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode_outer(regexp_extract_all(col("text"), lit("[A-Za-z]+"), lit(0)))
          .as("raw"))
      .select(col("doc_id"), lower(col("raw")).as("word"))

  /** The trained vocabulary with scores (top-V substrings by corpus
    * frequency, ties by token) — the SQL-replayable training face. */
  def vocabFrame(spark: SparkSession, dir: String): DataFrame = {
    val wc = wordOcc(Tables.documents(spark, dir))
      .filter(col("word").isNotNull)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    wc.select(col("word"), col("cnt"),
        explode(sequence(lit(1), length(col("word")))).as("p"))
      .select(col("word"), col("cnt"), col("p"),
        explode(sequence(lit(1),
          least(lit(MaxTokenLen), length(col("word")) - col("p") + 1))).as("l"))
      .select(col("word").substr(col("p"), col("l")).as("tok"), col("cnt"))
      .groupBy(col("tok")).agg(sum(col("cnt")).as("freq"))
      .orderBy(col("freq").desc, col("tok"))
      .limit(VocabSize)
  }

  /** Materialize (or reuse) the vocabulary for this corpus snapshot;
    * returns the trained tokens. Collect is [[VocabSize]]-bounded —
    * trained model state, the codebook convention. */
  def ensureVocab(spark: SparkSession, dir: String): Array[String] = {
    val path = graft.ops.Layout.indexPath("subword_vocab", dir)
    val sig = s"${graft.ops.Layout.dataSig(s"$dir/documents.parquet")}_v${VocabSize}_m$MaxTokenLen"
    graft.ops.Layout.ensureSigGated(path, sig) {
      vocabFrame(spark, dir).coalesce(1)
        .write.mode("overwrite").parquet(s"$path/vocab.parquet")
    }
    spark.read.parquet(s"$path/vocab.parquet")
      .select(col("tok")).collect().map(_.getString(0))
  }

  /** Per-doc word/subword counts of an arbitrary documents frame under
    * a FIXED vocabulary — the shared core of the batch query and the
    * streaming ingest face ([[graft.streaming.StreamingSubword]]);
    * per-doc stateless given the vocab, so epoch outputs tile. */
  def countsOf(docs: DataFrame, vocab: Array[String]): DataFrame =
    wordOcc(docs)
      .select(col("doc_id"),
        col("word"),
        graft.functions.SubwordCount
          .subwordCount(col("word"), vocab, MaxTokenLen).as("toks"))
      .groupBy(col("doc_id"))
      .agg(count(col("word")).as("n_words"),
        coalesce(sum(col("toks")), lit(0L)).as("n_subwords"))

  /** x_subword_tokenize — per-document word and subword-token counts
    * under the corpus-trained vocabulary. */
  def subwordTokenize(spark: SparkSession, dir: String): DataFrame =
    countsOf(Tables.documents(spark, dir), ensureVocab(spark, dir))
      .orderBy(col("doc_id"))
}
