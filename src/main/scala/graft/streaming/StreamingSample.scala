package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType}

/** Streaming maintenance of the exact-k per-stratum HOLDOUT sample —
  * the ingest-time face of [[graft.operators.CorpusOps.sampleExactK]]:
  * as documents arrive, each language's k smallest md5(doc_id) hashes
  * are kept current, so "the eval set" is always defined over the
  * corpus-so-far without ever rescanning it.
  *
  * Why the stream face is EXACT: min-k-by-hash is a MERGEABLE summary
  * (the k smallest of a union is the k smallest of the per-part
  * k-smallest — the same argument as the Misra-Gries and TopK folds),
  * so per-batch bounded partials + an algebraic fold reproduce the
  * batch ranking bit-for-bit. The fold rides the shared epoch-keyed
  * appender ([[Compaction.appendBatch]]/[[Snapshots]]): idempotent per
  * batchId, compactable to one |langs|-row base, restart-safe.
  *
  * Note the honest semantic: the sample of a GROWING corpus is a
  * MOVING set (a new document with a smaller hash displaces the
  * largest member — uniformity demands it). What is stable is the
  * k-prefix property at any fixed corpus (k=10 ⊆ k=25, spec-pinned on
  * the batch face) and determinism (same corpus ⇒ same sample,
  * regardless of arrival order or batch boundaries — spec-pinned
  * here). State is k×|langs| pairs — O(sample), not O(corpus). */
object StreamingSample {

  /** One micro-batch's bounded partial: per language, its ≤k smallest
    * (negated-hash, doc_id) pairs in heap order. */
  def partialOf(batch: DataFrame, k: Int): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val agg = new graft.functions.TopKAggregator(k)
    batch
      .select(col("lang"), col("doc_id"),
        (-conv(substring(md5(col("doc_id").cast(StringType)), 1, 15),
          16, 10).cast(LongType)).as("score"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .agg(agg.toColumn.name("topk"))
      .toDF("lang", "topk")
  }

  /** The partial-merge: explode accumulated heaps and re-fold through
    * the same bounded aggregator — mergeability makes this exact. */
  private def mergePartials(partials: DataFrame, k: Int): DataFrame = {
    val spark = partials.sparkSession
    import spark.implicits._
    val agg = new graft.functions.TopKAggregator(k)
    partials
      .select(col("lang"), explode(col("topk")).as("e"))
      .select(col("lang"), col("e._2").as("doc_id"), col("e._1").as("score"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .agg(agg.toColumn.name("topk"))
      .toDF("lang", "topk")
  }

  /** Append one batch's partial — idempotent per batchId. */
  def appendBatch(root: String, k: Int)(batch: DataFrame, batchId: Long): Unit =
    Compaction.appendBatch(partialOf(batch, k), root, batchId)

  /** Wire a documents stream into sample maintenance. */
  def start(docs: DataFrame, root: String, checkpoint: String, k: Int = 25,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .foreachBatch(appendBatch(root, k) _)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** The maintained sample, in [[graft.operators.CorpusOps
    * .sampleExactK]]'s exact output shape (lang, rank, doc_id). */
  def read(spark: SparkSession, root: String, k: Int = 25): DataFrame =
    mergePartials(
      spark.read.parquet(Snapshots.resolve(spark, root)).drop("batch"), k)
      .select(col("lang"), posexplode(col("topk")))
      .select(col("lang"), (col("pos") + 1).cast(LongType).as("rank"),
        col("col._2").as("doc_id"))
      .orderBy(col("lang"), col("rank"))

  /** Fold all epochs into one |langs|-row base partial (compaction). */
  def compact(spark: SparkSession, root: String, k: Int = 25): Unit =
    Compaction.compact(spark, root) { (df, out) =>
      mergePartials(df, k).coalesce(1).write.mode("overwrite").parquet(out)
    }
}
