package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.VectorFunctions._

/** Similarity search over embedding columns (driver mandate: brute-force
  * cosine top-k baseline + an LSH-bucketed ANN scale path).
  *
  * Scale design:
  *  - [[knnCosine]] is a full scan + TakeOrderedAndProject: per-partition
  *    top-k heaps, then k·partitions rows to the driver — no global sort,
  *    no shuffle of the vectors themselves. At 100 TB this is the honest
  *    exact baseline (one pass over the data).
  *  - [[annKnnCosine]] buckets vectors by sign-random-projection (SRP)
  *    bits; the query probes only its own bucket (multi-probe = flip one
  *    bit at a time). Bucketing is a deterministic projection; at scale
  *    the bucketed table would be written out partitioned by bucket so a
  *    query prunes to matching files (partition pruning at the scan).
  *  - [[embeddingNearDupPairs]] is all-pairs near-dup: the oracle-able
  *    brute form joins on a 1-row broadcast (trivial); the scale form is
  *    SRP-bucket self-join — same shape as MinHash banding.
  */
object Similarity {

  /** The fixed query vector: the embedding of `vec_id = queryId`
    * (broadcast as a 1-row dimension — no collect). */
  private def queryVec(spark: SparkSession, dir: String, queryId: Long): DataFrame =
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") === queryId)
      .select(col("embedding").as("qvec"))

  /** x_knn_cosine — exact brute-force cosine top-k against the query
    * vector. Float→Double promotion + sequential sums (see
    * VectorFunctions) keep the score bit-identical to the DuckDB oracle. */
  def knnCosine(spark: SparkSession, dir: String,
      queryId: Long = 0L, k: Int = 20): DataFrame =
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(queryVec(spark, dir, queryId)))
      .select(col("vec_id"), col("label").cast(LongType).as("label"),
        cosine(col("embedding"), col("qvec")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)

  /** x_ann_lsh — approximate top-k: SRP-bucketed candidate set (query
    * bucket + all 1-bit-flip neighbor buckets = multi-probe), exact
    * cosine re-rank within candidates. Recall vs [[knnCosine]] is
    * scalatest-checked; not DuckDB-oracled (bucket layout is an
    * implementation detail). */
  def annKnnCosine(spark: SparkSession, dir: String, queryId: Long = 0L,
      k: Int = 20, nPlanes: Int = 8, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(nPlanes, 64, seed)
    val emb = Tables.embeddings(spark, dir)
      .withColumn("bucket", srpBucket(col("embedding"), planes))
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qvec"), col("bucket").as("qbucket"))
    // multi-probe: query bucket plus every 1-bit flip of it
    val probes = explode(array((-1 until nPlanes).map {
      case -1 => col("qbucket")
      case i  => col("qbucket").bitwiseXOR(lit(1L << i))
    }: _*)).as("probe")
    val probeBuckets = q.select(col("qvec"), probes)
    emb.filter(col("vec_id") =!= queryId)
      .join(broadcast(probeBuckets), col("bucket") === col("probe"))
      .select(col("vec_id"), col("label").cast(LongType).as("label"),
        cosine(col("embedding"), col("qvec")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** x_embed_near_dup — all-pairs embedding near-duplicates
    * (cosine ≥ threshold), exact brute form for the oracle. The scale
    * form is the same verification over SRP-bucket candidates
    * ([[annNearDupPairs]]). */
  def embeddingNearDupPairs(spark: SparkSession, dir: String,
      threshold: Double = 0.4): DataFrame = {
    // norms precomputed once per vector (not once per pair): cuts the
    // per-pair work to one dot product + one divide
    val e = Tables.embeddings(spark, dir)
      .withColumn("nrm", norm(col("embedding")))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** SRP-bucketed near-dup pairs: candidates from bucket equality
    * (+ verification), the linear-ish scale path for all-pairs. */
  def annNearDupPairs(spark: SparkSession, dir: String,
      threshold: Double = 0.4, nPlanes: Int = 6, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(nPlanes, 64, seed)
    val emb = Tables.embeddings(spark, dir)
      .withColumn("bucket", srpBucket(col("embedding"), planes))
      .withColumn("nrm", norm(col("embedding")))
    emb.as("a")
      .join(emb.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .orderBy(col("vec_a"), col("vec_b"))
  }
}
