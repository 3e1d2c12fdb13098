package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.streaming.{IncrementalClusters, IncrementalIndex}

/** Incremental maintenance of the cluster DECISION: per-micro-batch
  * pair discovery merged into the existing labeling via the canon-graph
  * contraction must equal whole-corpus label propagation — including
  * when a batch MERGES two components that earlier batches built
  * separately. Mirror of IncrementalIndexSpec, one level up the stack. */
class IncrementalClustersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  private def labelMap(df: DataFrame): Map[Long, Long] =
    df.select(col("doc_id"), col("canon")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Ground truth: min-id connected components over an explicit pair
    * list, plus singletons for the rest of `ids`. */
  private def ccByHand(ids: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    ids.map(i => i -> find(i)).toMap
  }

  test("canon-graph merge equals union-find across batches, incl. a component-merging batch") {
    import spark.implicits._
    // hand-built graph: batch 0 creates {1,2} and {10,11}; batch 1 grows
    // {1,2,3}; batch 2 arrives with doc 5 whose pairs BRIDGE the two
    // existing components (the case full re-propagation handles trivially
    // and naive per-batch merging gets wrong if it only relabels new docs)
    val batches = Seq(
      (Seq(1L, 2L, 10L, 11L, 20L), Seq((1L, 2L), (10L, 11L))),
      (Seq(3L, 21L), Seq((2L, 3L))),
      (Seq(5L), Seq((5L, 3L), (5L, 10L))))
    var labels = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("canon",
          org.apache.spark.sql.types.LongType))))
    var allIds = Seq.empty[Long]
    var allPairs = Seq.empty[(Long, Long)]
    batches.foreach { case (ids, pairs) =>
      allIds ++= ids; allPairs ++= pairs
      labels = Dedup.mergeClustersBatch(labels,
        ids.toDF("doc_id"), pairs.toDF("doc_a", "doc_b"))
        .localCheckpoint()
      assert(labelMap(labels) === ccByHand(allIds, allPairs),
        s"after batch with ids=$ids")
    }
    // the bridging batch really merged: 1,2,3,5,10,11 share canon 1
    val fin = labelMap(labels)
    assert(Seq(2L, 3L, 5L, 10L, 11L).forall(fin(_) == 1L))
    assert(fin(20L) == 20L && fin(21L) == 21L)
  }

  test("streamed fold equals the batch-built cluster decision on the real corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = TestSpark.tempDir("incclu")
    val (indexRoot, labelsRoot, ckpt) =
      (s"$base/index", s"$base/labels", s"$base/ckpt")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .as[IdxDoc].collect()
    // id%3 waves split the fixture's id-adjacent near-dup pairs across
    // waves, so cross-batch merging is genuinely exercised
    val waves = docs.groupBy(_.doc_id % 3).toSeq.sortBy(_._1).map(_._2)
    val input = MemoryStream[IdxDoc]
    waves.foreach { wave =>
      input.addData(wave.toSeq)
      val q = IncrementalClusters.start(input.toDS().toDF(),
        indexRoot, labelsRoot, ckpt)
      q.awaitTermination(120000)
    }
    val inc = labelMap(IncrementalClusters.readLabels(spark, labelsRoot))
    // batch twin: whole-corpus propagation over the SAME banding
    // (dupClusters default: 128 hashes / 32 bands via the materialized
    // index — identical seeds, so identical pair recall)
    val batch = labelMap(Dedup.dupClusters(spark, dir)
      .select(col("doc_id"), col("canon")))
    assert(inc === batch,
      "incremental cluster maintenance must equal the batch rebuild")
    // the emission step consumes the streamed labeling unchanged:
    // keep-best over it equals keep-best over the batch-built index
    val keepInc = Dedup.dedupKeepBestFrom(
        IncrementalClusters.readLabels(spark, labelsRoot),
        graft.operators.TextAnalysis.textQuality(spark, dir))
      .collect().map(_.toSeq).toSeq
    val keepBatch = Dedup.dedupKeepBest(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(keepInc === keepBatch,
      "keep-best over streamed labels must equal the batch emission")
  }

  test("replaying a batchId rewrites the same epoch snapshot (exactly-once fold)") {
    import spark.implicits._
    val base = TestSpark.tempDir("incclu-replay")
    val (indexRoot, labelsRoot) = (s"$base/index", s"$base/labels")
    val b0 = Seq(IdxDoc(1, "a b c d e f"), IdxDoc(2, "a b c d e g")).toDF()
    val b1 = Seq(IdxDoc(3, "a b c d e h")).toDF()
    IncrementalClusters.appendBatch(indexRoot, labelsRoot)(b0, 0L)
    IncrementalClusters.appendBatch(indexRoot, labelsRoot)(b1, 1L)
    val once = labelMap(IncrementalClusters.readLabels(spark, labelsRoot))
    // foreachBatch replay of the LAST batch after a crash: reads the
    // predecessor epoch (0), overwrites epoch 1 — same fold, same state
    IncrementalClusters.appendBatch(indexRoot, labelsRoot)(b1, 1L)
    assert(labelMap(IncrementalClusters.readLabels(spark, labelsRoot)) === once)
    assert(IncrementalClusters.readLabels(spark, labelsRoot).count() === 3L)
  }

  test("epoch retention sweep bounds fold state without changing reads or replay") {
    import spark.implicits._
    val base = TestSpark.tempDir("incclu-prune")
    val (indexRoot, labelsRoot) = (s"$base/index", s"$base/labels")
    val waves = Seq(
      Seq(IdxDoc(1, "a b c d e f"), IdxDoc(2, "a b c d e g")),
      Seq(IdxDoc(3, "a b c d e h")),
      Seq(IdxDoc(4, "z y x w v u")),
      Seq(IdxDoc(5, "z y x w v t")))
    waves.zipWithIndex.foreach { case (w, i) =>
      IncrementalClusters.appendBatch(indexRoot, labelsRoot)(w.toDF(), i.toLong)
    }
    val before = labelMap(IncrementalClusters.readLabels(spark, labelsRoot))
    val swept = IncrementalClusters.pruneEpochs(spark, labelsRoot, keep = 2)
    assert(swept === Seq(0L, 1L), "oldest snapshots are the superseded ones")
    assert(!new java.io.File(labelsRoot, "epoch=0").exists)
    assert(new java.io.File(labelsRoot, "epoch=3").exists)
    assert(labelMap(IncrementalClusters.readLabels(spark, labelsRoot)) === before,
      "retention must not change what consumers read")
    // a replay of the newest batch still folds from its predecessor
    IncrementalClusters.appendBatch(indexRoot, labelsRoot)(
      waves.last.toDF(), 3L)
    assert(labelMap(IncrementalClusters.readLabels(spark, labelsRoot)) === before)
    // retention below the in-flight-reader floor is refused
    intercept[IllegalArgumentException] {
      IncrementalClusters.pruneEpochs(spark, labelsRoot, keep = 1)
    }
  }

  test("epoch discovery goes through the Hadoop FileSystem API (scheme-qualified root)") {
    import spark.implicits._
    // a java.io.File-based listing cannot resolve a scheme-qualified
    // root ("file://…"); the Hadoop FileSystem API can — and the same
    // resolution is what makes the fold work on hdfs:// and s3a://
    // roots, where java.io.File.listFiles returns null and the
    // pre-round-8 code silently restarted the fold from an EMPTY
    // predecessor
    val base = TestSpark.tempDir("incclu-hadoopfs")
    val root = s"file://$base/labels"
    Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "canon")
      .write.parquet(s"$root/epoch=0")
    Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("doc_id", "canon")
      .write.parquet(s"$root/epoch=1")
    assert(labelMap(IncrementalClusters.readLabelsBefore(spark, root, 1L))
      === Map(1L -> 1L, 2L -> 1L),
      "predecessor read must find epoch 0 through the scheme-qualified root")
    assert(labelMap(IncrementalClusters.readLabels(spark, root))
      === Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
    // nonexistent root = stream start: the empty labeling, not an error
    assert(IncrementalClusters.readLabels(spark, s"file://$base/nothere")
      .count() === 0L)
  }
}
