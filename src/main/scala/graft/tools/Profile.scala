package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Dev profiling harness: stage-by-stage timings of the heavy operators
  * (run with `sbt "runMain graft.tools.Profile <sfDir>"`). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
      println(f"[profile] $name: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    spark.read.parquet(s"$dir/documents.parquet").count() // warm-up

    val exploded = graft.operators.Dedup.explodedShingles(
      Tables.documents(spark, dir), 3)
    time("minhash/exploded-shingles")(exploded.count())
    val minCols = (0 until 64).map(s =>
      min(xxhash64(lit(s), col("shingle"))).as(s"h$s"))
    val sigs = exploded.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"),
        array((0 until 64).map(s => col(s"h$s")): _*).as("sig"))
    time("minhash/signatures")(sigs.count())
    val banded = sigs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(15)),
        b => hash(slice(col("sig"), b * 4 + lit(1), lit(4)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    time("minhash/banded")(banded.count())
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val n = time("minhash/candidates")(cand.count())
    println(s"[profile] n_candidates=$n")
    time("minhash/full")(graft.operators.Dedup.minhashNearDup(spark, dir).count())
    time("ngram_jaccard/full")(graft.operators.Dedup.ngramJaccardPairs(spark, dir).count())
    spark.stop()
  }
}
