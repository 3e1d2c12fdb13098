package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: SRP bucket-occupancy distribution for the adaptive
  * near-dup LSH sizing ([[graft.operators.Similarity.adaptivePlanes]]) —
  * real embedding corpora are CLUSTERED, so bucket occupancy is far from
  * the uniform n/2^planes; the max-occupancy bucket bounds the skew of
  * the within-bucket self-join (its pair count lands on one task).
  *
  * Run: `sbt "runMain graft.tools.BucketProbe <dir>"`.
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.embeddings(spark, dir)
    val n = emb.count()
    val planes = graft.operators.Similarity.adaptivePlanes(n)
    val tables = graft.operators.Similarity.adaptiveTables(planes)
    println(s"[probe] n=$n planes=$planes tables=$tables " +
      s"(uniform occupancy would be ${n.toDouble / (1L << planes)})")
    val composedArr = array((0 until tables).map(t =>
      graft.functions.VectorFunctions.srpBucket(col("embedding"),
        graft.functions.VectorFunctions.hyperplanes(planes, 64, 42L + t))): _*)
    val allPlanes = (0 until tables).flatMap(t =>
      graft.functions.VectorFunctions.hyperplanes(planes, 64, 42L + t)
        .map(_.toArray)).toArray
    val bucketArr =
      graft.functions.SrpBuckets.buckets(col("embedding"), allPlanes, tables)
    val occ = emb
      .select(col("vec_id"), posexplode(bucketArr).as(Seq("tbl", "bucket")))
      .groupBy("tbl", "bucket").count()
    occ.agg(count(lit(1)).as("n_buckets"), max("count").as("max_occ"),
      expr("percentile(count, 0.5)").as("p50"),
      expr("percentile(count, 0.99)").as("p99"),
      sum(col("count") * (col("count") - 1) / 2).as("total_cand_pairs")).show()
    occ.orderBy(col("count").desc).show(10)
    // stage timing of the x_embed_near_dup_lsh plan: where does the
    // wall-clock actually go at 10×?
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[probe] $name: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val tabbed = emb
      .select(col("vec_id"), posexplode(bucketArr).as(Seq("tbl", "bucket")))
    time("stage/bucket_compute (fused srp_buckets)")(tabbed.count())
    time("stage/bucket_compute (composed per-plane dots — the pre-r10 form)")(
      emb.select(col("vec_id"),
        posexplode(composedArr).as(Seq("tbl", "bucket"))).count())
    val ck = time("stage/bucket_checkpoint")(tabbed.localCheckpoint(true, graft.ops.Pin.Level))
    val cand = ck.as("a")
      .join(ck.as("b"),
        col("a.tbl") === col("b.tbl") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
    time("stage/candidates")(println(s"  candidates=${cand.count()}"))
    val dd = cand.dropDuplicates("vec_a", "vec_b")
    time("stage/dedup")(println(s"  unique=${dd.count()}"))
    time("stage/full_query")(
      graft.operators.Similarity.annNearDupPairs(spark, dir).count())
    spark.stop()
  }
}
