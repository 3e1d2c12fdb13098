package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-separation experiment (SURVEY §6): replicate the sf0.1 documents
  * corpus 10× (each replica lightly salted so replicas are NEAR-dups, not
  * exact dups — realistic cluster structure: ~10-doc components), then
  * time the exact quadratic path vs the MinHash+LSH path for BOTH the
  * pair queries and the clustering decision built on them.
  *
  * Run: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ScaleBench"`.
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // replication factor; beyond 10 the exact quadratic paths stop being
    // runnable in a bench budget, so they are skipped — which is itself
    // the measurement (the LSH/index path keeps completing)
    val factor = if (args.length > 1) args(1).toInt else 10
    val runExact = factor <= 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config(graft.Sessions.conf(cpus))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[scale] $name: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    // 10× corpus: replica r of doc d gets id 10d+r and a per-replica salt
    // token (unique shingles at the tail), so same-doc replicas sit at
    // jaccard ≈ 0.9 — true near-dup components of size ~10
    val scaleDir = s"${sys.props("java.io.tmpdir")}/graft_scale$factor"
    val docs = graft.Tables.documents(spark, srcDir)
    val replicated = docs
      .crossJoin(spark.range(factor).toDF("r"))
      .withColumn("text",
        concat(col("text"), lit(" zz"), col("doc_id"), lit("x"), col("r")))
      .select(
        (col("doc_id") * factor + col("r")).as("doc_id"),
        col("text"),
        col("lang"), col("source"),
        // metadata must match the salted text, not the original's
        length(col("text")).cast("bigint").as("n_chars"))
    replicated.write.mode("overwrite").parquet(s"$scaleDir/documents.parquet")
    val n = spark.read.parquet(s"$scaleDir/documents.parquet").count()
    println(s"[scale] corpus: $n docs")

    // index build = the once-per-snapshot ETL cost the queries amortize
    time("index/minhash_build (once per corpus)")(
      graft.operators.Dedup.ensureMinhashIndex(spark, scaleDir))
    val mhIdxPairs = time("pairs/minhash_indexed (declared path)")(
      graft.operators.Dedup.minhashNearDupIndexed(spark, scaleDir).count())
    val mhClusters = time("clusters/from_minhash_index (declared path)")(
      graft.operators.Dedup.dupClusters(spark, scaleDir)
        .filter(col("is_canonical")).count())
    if (runExact) {
      val mhPairs = time("pairs/minhash_inline")(
        graft.operators.Dedup.minhashNearDup(spark, scaleDir).count())
      val exPairs = time("pairs/exact_jaccard")(
        graft.operators.Dedup.ngramJaccardPairs(spark, scaleDir).count())
      println(s"[scale] pairs: indexed=$mhIdxPairs inline=$mhPairs exact=$exPairs")
      val exClusters = time("clusters/from_exact (ground truth)")(
        graft.operators.Dedup.dupClusters(spark, scaleDir, exactPairs = true)
          .filter(col("is_canonical")).count())
      println(s"[scale] clusters: minhash=$mhClusters exact=$exClusters")
    } else {
      println(s"[scale] pairs: indexed=$mhIdxPairs (exact paths skipped at $factor×: quadratic)")
      println(s"[scale] clusters: minhash=$mhClusters")
    }
    spark.stop()
  }
}
