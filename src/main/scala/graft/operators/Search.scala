package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Keyword search over the corpus: a materialized inverted (postings)
  * index and the queries it serves — boolean-AND keyword lookup and
  * TF-IDF term scoring.
  *
  * Scale design: the postings table (term, doc_id, tf) is the classic
  * search-engine layout. It is materialized ONCE per corpus snapshot
  * (freshness-gated like the SRP/IVF/MinHash indexes), written sorted by
  * term so parquet row-group min/max statistics make a term lookup skip
  * everything else (PushedFilters at the scan — at millions of distinct
  * terms, directory-per-term partitioning is unworkable, but sorted row
  * groups give the same pruning at file granularity). Queries then touch
  * only the probed terms' postings: no re-tokenization of the corpus, no
  * shuffle of document text — the same amortization argument as the ANN
  * indexes, for the lexical-search modality. */
object Search {

  /** Postings rows from raw documents: one row per (term, doc, term
    * frequency). One explode + one aggregation — the index build is a
    * single pass over the corpus. */
  def postings(spark: SparkSession, dir: String): DataFrame =
    postingsOf(Tables.documents(spark, dir))

  /** [[postings]] over an arbitrary documents frame — postings rows are
    * a pure per-document function (a doc's terms and tfs depend on that
    * doc alone), which is what makes per-micro-batch incremental append
    * EXACT ([[graft.streaming.IncrementalPostings]]), the same argument
    * as the signature index. */
  def postingsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

  def postingsIndexPath(dir: String): String =
    graft.ops.Layout.indexPath("postings", dir)

  /** Materialize the postings index sorted by term (row-group stats →
    * term-lookup skipping). Freshness-gated on the source documents. */
  def ensurePostingsIndex(spark: SparkSession, dir: String): String = {
    val sig = graft.ops.Layout.dataSig(s"$dir/documents.parquet")
    graft.ops.Layout.ensureSigGated(postingsIndexPath(dir), sig) {
      postings(spark, dir)
        // cluster by term, order within files: a term's postings land
        // contiguously in one file's few row groups
        .repartition(8, col("term"))
        .sortWithinPartitions(col("term"), col("doc_id"))
        .write.mode("overwrite").parquet(postingsIndexPath(dir))
    }
  }

  /** Boolean-AND candidates from the postings index: (doc_id, tf_sum)
    * for every doc containing ALL query terms. The scan reads only the
    * probed terms' postings (PushedFilters on `term`); the aggregation
    * touches candidate docs, not the corpus. Shared by the lexical and
    * hybrid query faces so the AND-match logic lives once. */
  private def andCandidates(spark: SparkSession, dir: String,
      terms: Seq[String]): DataFrame =
    andCandidatesFrom(
      spark.read.parquet(ensurePostingsIndex(spark, dir)), terms)

  /** [[andCandidates]] over an arbitrary postings frame — shared with
    * the incrementally-maintained index, whose reads push the same term
    * filter (each batch directory is term-clustered at append time). */
  private[graft] def andCandidatesFrom(post: DataFrame,
      terms: Seq[String]): DataFrame =
    post
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("term")).as("n_matched"),
        sum(col("tf")).as("tf_sum"))
      .filter(col("n_matched") === terms.distinct.size)
      .select(col("doc_id"), col("tf_sum"))

  /** x_keyword_search — boolean-AND keyword query served from the
    * postings index: documents containing ALL query terms, ranked by
    * total term frequency. */
  def keywordSearch(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("spark", "merge")): DataFrame =
    andCandidates(spark, dir, terms)
      .orderBy(col("tf_sum").desc, col("doc_id"))

  /** Positional postings rows: one row per TOKEN OCCURRENCE (term,
    * doc, position) — the layout phrase and proximity queries need,
    * where the tf postings only answer bag-of-words. Pure per-document
    * (a doc's occurrences depend on that doc alone), so the same
    * incremental-append argument as [[postingsOf]] applies. */
  def positionalPostingsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
      .select(col("term"), col("doc_id"), col("pos").cast(LongType).as("pos"))

  def positionalIndexPath(dir: String): String =
    graft.ops.Layout.indexPath("postings_pos", dir)

  /** Materialize the positional index term-sorted (row-group min/max →
    * term-lookup skipping, same argument as [[ensurePostingsIndex]]).
    * ~|tokens| rows vs the tf index's |distinct (term,doc)| — the
    * classic positional-index size trade, paid once per snapshot. */
  def ensurePositionalIndex(spark: SparkSession, dir: String): String = {
    val sig = graft.ops.Layout.dataSig(s"$dir/documents.parquet")
    graft.ops.Layout.ensureSigGated(positionalIndexPath(dir), sig) {
      positionalPostingsOf(Tables.documents(spark, dir))
        .repartition(8, col("term"))
        .sortWithinPartitions(col("term"), col("doc_id"), col("pos"))
        .write.mode("overwrite").parquet(positionalIndexPath(dir))
    }
  }

  /** x_phrase_search — EXACT PHRASE query served from the positional
    * index: documents containing the query terms at consecutive
    * positions, with the occurrence count. The classic positional
    * intersection (Manning/Raghavan/Schütze IR ch. 2): one leg per
    * phrase slot reads ONLY that term's postings (pushed term filter —
    * term-sorted row groups skip the rest), normalized to the
    * occurrence START the slot implies (`pos - i`), then the legs
    * equi-join on (doc, start) — every surviving row is one phrase
    * occurrence. Shuffles are candidate-sized (the probed terms'
    * postings), never corpus-sized; Catalyst/AQE orders the join chain
    * by the observed leg sizes, the rarest-first heuristic for free.
    * Repeated terms in the phrase need no special casing: each slot is
    * its own leg over the same postings with a different offset. */
  def phraseSearch(spark: SparkSession, dir: String,
      phrase: Seq[String] = Seq("spark", "merge")): DataFrame = {
    // RAREST-FIRST join ordering, made real rather than hoped-for:
    // per-term document frequencies come from the tf postings index
    // (one pushed-term probe of |phrase| terms' rows — the classic
    // query-planning read every search engine does), and the leg chain
    // intersects the rarest term's occurrences first, so every later
    // join's left side is already no bigger than the scarcest list.
    // The (doc, start) equi-joins are inner and key-preserving, so leg
    // order never changes results (spec + oracle pin that).
    val tf = spark.read.parquet(ensurePostingsIndex(spark, dir))
    val df = tf.filter(col("term").isin(phrase.distinct: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val order = phrase.indices.sortBy(i => (df.getOrElse(phrase(i), 0L), i))
    phraseSearchFrom(
      spark.read.parquet(ensurePositionalIndex(spark, dir)), phrase, order)
  }

  /** [[phraseSearch]] over an arbitrary positional-postings frame —
    * shared with the incrementally-maintained index
    * ([[graft.streaming.IncrementalPostings.appendPositionalBatch]]).
    * `legOrder` permutes which phrase slot anchors the join chain
    * (default: phrase order). */
  private[graft] def phraseSearchFrom(post: DataFrame,
      phrase: Seq[String], legOrder: Seq[Int] = Seq.empty): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val legs = phrase.zipWithIndex.map { case (t, i) =>
      post.filter(col("term") === t)
        .select(col("doc_id"), (col("pos") - i).as("start"))
    }
    val ordered =
      if (legOrder.isEmpty) legs else legOrder.map(legs)
    ordered.reduce((a, b) => a.join(b, Seq("doc_id", "start")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occ"))
      .orderBy(col("n_occ").desc, col("doc_id"))
  }

  /** The phrase oracle: the same per-slot leg construction in SQL —
    * positions from DuckDB's zipped unnest/generate_subscripts (0-based
    * to match posexplode). */
  def phraseOracleSql(phrase: Seq[String] = Seq("spark", "merge")): String = {
    val legs = phrase.zipWithIndex.map { case (t, i) =>
      s"l$i AS (SELECT doc_id, pos - $i AS start FROM pp WHERE term = '$t')"
    }
    val joins = (1 until phrase.size)
      .map(i => s"JOIN l$i USING (doc_id, start)").mkString(" ")
    s"""WITH pp AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
       |         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
       |  FROM documents),
       |${legs.mkString(",\n")}
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occ
       |FROM l0 $joins
       |GROUP BY doc_id ORDER BY n_occ DESC, doc_id""".stripMargin
  }

  /** x_proximity_search — UNORDERED within-k co-occurrence from the
    * same positional index: documents where the two terms appear within
    * `slop` token positions of each other (either order), with the
    * co-occurrence pair count — the NEAR operator of classic IR, the
    * relevance signal between exact-phrase (slop ≡ 1, ordered) and
    * bag-of-words AND (slop ≡ ∞). Plan shape: two pushed-term postings
    * legs equi-join on doc_id with the |pa − pb| ≤ slop band as a
    * residual predicate — candidate-sized like the phrase legs. */
  def proximitySearch(spark: SparkSession, dir: String,
      termA: String = "spark", termB: String = "merge",
      slop: Int = 5): DataFrame = {
    val post = spark.read.parquet(ensurePositionalIndex(spark, dir))
    val a = post.filter(col("term") === termA)
      .select(col("doc_id"), col("pos").as("pa"))
    val b = post.filter(col("term") === termB)
      .select(col("doc_id"), col("pos").as("pb"))
    a.join(b, Seq("doc_id"))
      .filter(abs(col("pa") - col("pb")) <= slop)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("n_pairs").desc, col("doc_id"))
  }

  /** x_hybrid_search — lexical recall + vector re-rank, the standard
    * two-stage retrieval: the postings index yields the boolean-AND
    * candidate set (pushed term filter — touches only probed postings),
    * then ONLY those candidates' embeddings are scored by exact cosine
    * against the query vector. At 100 TB the lexical stage prunes the
    * corpus so the vector math runs on a candidate set, not a scan —
    * the complement of the ANN indexes' geometric pruning. Scores are
    * bit-exact cross-engine (same discipline as x_knn_cosine). */
  def hybridSearch(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("spark", "merge"), queryId: Long = 0L,
      k: Int = 10): DataFrame = {
    import graft.functions.VectorFunctions.cosine
    val cands = andCandidates(spark, dir, terms)
      .filter(col("doc_id") =!= queryId)
    val qvec = Tables.embeddings(spark, dir)
      .filter(col("vec_id") === queryId)
      .select(col("embedding").as("qvec"))
    Tables.embeddings(spark, dir)
      .join(broadcast(cands), col("vec_id") === col("doc_id"))
      .crossJoin(broadcast(qvec))
      .select(col("doc_id"), col("tf_sum"),
        cosine(col("embedding"), col("qvec")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("doc_id"))
      .limit(k)
  }

  /** The RRF smoothing constant (Cormack/Clarke/Buettcher 2009's k=60,
    * the value every production fusion uses). */
  final val RrfK = 60L

  /** x_rrf_fusion — Reciprocal Rank Fusion of the lexical and vector
    * rankings: score(d) = Σ_lists 1/(k + rank_list(d)) over the UNION
    * of both top lists — the standard way hybrid retrieval combines
    * rankings whose raw scores are incommensurable (a BM25 weight and
    * a cosine live on different scales; ranks don't). Complements
    * x_hybrid_search, which is the other canonical composition
    * (lexical recall → vector re-rank).
    *
    * Ranks are total-ordered (primary score desc, doc_id asc) and the
    * fused score is emitted in integer NANOUNITS — floor(1e9∕(k+r)) per
    * list — so the gate hashes exact integers (the f0_micro argument;
    * quotients of small integers are ≥0.016 apart, so the floor can
    * never sit on a cross-engine boundary). Both inputs are top-k
    * CANDIDATE LISTS (the lexical AND-set, the vector top-`vecK`), so
    * the unpartitioned rank windows order dozens of rows, not the
    * corpus — at 100 TB the candidate generators prune (postings
    * probes, the ANN ladder), fusion stays O(k). */
  def rrfFusion(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("spark", "merge"), queryId: Long = 0L,
      vecK: Int = 50, k: Int = 20): DataFrame = {
    import graft.functions.VectorFunctions.cosine
    import org.apache.spark.sql.expressions.Window
    val lex = andCandidates(spark, dir, terms)
      .filter(col("doc_id") =!= queryId)
      .withColumn("rank_lex", row_number().over(
        Window.orderBy(col("tf_sum").desc, col("doc_id"))))
      .select(col("doc_id"), col("rank_lex"))
    val qvec = Tables.embeddings(spark, dir)
      .filter(col("vec_id") === queryId)
      .select(col("embedding").as("qvec"))
    val vec = Tables.embeddings(spark, dir)
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(qvec))
      .select(col("vec_id").as("doc_id"),
        cosine(col("embedding"), col("qvec")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("doc_id"))
      .limit(vecK)
      .withColumn("rank_vec", row_number().over(
        Window.orderBy(col("cos_sim").desc, col("doc_id"))))
      .select(col("doc_id"), col("rank_vec"))
    def part(r: org.apache.spark.sql.Column) =
      coalesce(floor(lit(1000000000L) / (lit(RrfK) + r)).cast(LongType), lit(0L))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("rank_lex"), col("rank_vec"),
        (part(col("rank_lex")) + part(col("rank_vec"))).as("rrf_nano"))
      .orderBy(col("rrf_nano").desc, col("doc_id"))
      .limit(k)
  }

  /** x_tfidf — the TF-IDF statistics per (document, term), served from
    * the postings index: tf from the postings, df per term and the
    * corpus size N from two small aggregations OF the postings (no
    * second corpus pass).
    *
    * The ORACLED face is the integer domain (tf, df, n_docs) — the full
    * information content of TF-IDF, from which any weighting formula is
    * a pure derivation. The ln-based weight itself lives in
    * [[tfidfScored]] and is deliberately NOT in the hash gate: ln is not
    * guaranteed correctly rounded, so Spark (java.lang.Math.log) and
    * DuckDB (libm) can disagree in the last ulp, and a product landing
    * within an ulp of a quantization boundary would flip a floor() —
    * an intermittent-by-construction gate. A gate should be certain;
    * integers are. */
  def tfidf(spark: SparkSession, dir: String): DataFrame =
    tfidfFrom(spark.read.parquet(ensurePostingsIndex(spark, dir)))

  /** [[tfidf]] over an arbitrary postings frame: df and N are
    * aggregates OF the postings, so an incrementally-appended index
    * yields them as correctly as a batch-built one — corpus statistics
    * stay fresh per micro-batch for free. */
  private[graft] def tfidfFrom(post: DataFrame): DataFrame = {
    val df = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = post.select(countDistinct(col("doc_id")).as("n_docs"))
    post.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("n_docs"))
      .orderBy(col("doc_id"), col("term"))
  }

  /** The ranking weight over [[tfidf]]'s integer domain:
    * score = tf · ln(N/df), quantized to 1e-4 (well beyond ranking
    * precision). Engine-native floating point — spec-verified
    * (CorpusSearchSpec), not DuckDB-oracled; see [[tfidf]] for why. */
  def tfidfScored(spark: SparkSession, dir: String): DataFrame =
    tfidf(spark, dir)
      .withColumn("score",
        floor(col("tf").cast(DoubleType) *
          log(col("n_docs").cast(DoubleType) / col("df").cast(DoubleType)) *
          10000.0 + 0.5) / 10000.0)

  /** BM25 constants (Robertson/Spärck Jones; the Lucene defaults). */
  final val Bm25K1 = 1.2
  final val Bm25B = 0.75

  /** x_bm25 — BM25 ranking statistics per (document, term), served from
    * the postings index: tf and df as in [[tfidf]], plus the document
    * length `dl` (tokens per doc) and corpus totals that TF-IDF lacks —
    * BM25's improvement is exactly that it normalizes tf by document
    * length and saturates it.
    *
    * The ORACLED face carries the integer domain (tf, df, dl, n_docs,
    * total_tokens) AND the saturated-tf factor `tf_norm` =
    * tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl)): unlike ln, every
    * operation in it (×, /, +) is IEEE-correctly-rounded, so identical
    * integer inputs through the IDENTICAL expression tree give
    * bit-equal doubles on any engine — it belongs in the hash gate.
    * The ln-based idf lives in [[bm25Scored]], outside the gate, for
    * the same last-ulp reason as [[tfidfScored]].
    *
    * Scale: df is a small per-term aggregate (broadcast); dl is one row
    * per DOCUMENT — at corpus scale that is NOT broadcastable, so it
    * joins on doc_id as a keyed shuffle join (AQE may still broadcast
    * it at toy SF); corpus totals are a single row (broadcast). */
  def bm25(spark: SparkSession, dir: String): DataFrame = {
    val path = ensurePostingsIndex(spark, dir)
    val post = spark.read.parquet(path)
    val dft = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dl = post.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val corpus = dl.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("total_tokens"))
    val tfD = col("tf").cast(DoubleType)
    val dlOverAvg = col("dl").cast(DoubleType) *
      col("n_docs").cast(DoubleType) / col("total_tokens").cast(DoubleType)
    post.join(broadcast(dft), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(corpus))
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("dl"),
        col("n_docs"), col("total_tokens"),
        (tfD * lit(Bm25K1 + 1.0) /
          (tfD + lit(Bm25K1) * (lit(1.0 - Bm25B) + lit(Bm25B) * dlOverAvg)))
          .as("tf_norm"))
      .orderBy(col("doc_id"), col("term"))
  }

  /** The full BM25 weight over [[bm25]]'s domain:
    * score = tf_norm · ln((N − df + 0.5)/(df + 0.5) + 1). Engine-native
    * ln — spec-verified (CorpusSearchSpec asserts bit-equality against a
    * driver-side recompute and df-monotonicity), not DuckDB-oracled. */
  def bm25Scored(spark: SparkSession, dir: String): DataFrame =
    bm25(spark, dir)
      .withColumn("score",
        col("tf_norm") * log(
          (col("n_docs").cast(DoubleType) - col("df").cast(DoubleType) +
            lit(0.5)) / (col("df").cast(DoubleType) + lit(0.5)) + lit(1.0)))
}
