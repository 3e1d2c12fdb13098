package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev micro-probe for the r19 optimization round: warm timings of
  * ensure-layer metadata checks and candidate query decompositions.
  * Run: `sbt "runMain graft.tools.R19Probe /root/testdata/sf0.1"`. */
object R19Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config(graft.Sessions.conf(cpus))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[r19] $name: ${(System.nanoTime - t0) / 1e9}%.3f s"); r
    }
    spark.read.parquet(s"$dir/lineitem.parquet").count() // session warm-up
    spark.sql("SHOW DATABASES").collect()
    graft.ops.Layout.ensureBucketedStar(spark, dir) // cold ensure untimed
    for (i <- 1 to 3)
      time(s"ensureBucketedStar/warm$i")(graft.ops.Layout.ensureBucketedStar(spark, dir))
    for (i <- 1 to 2) {
      time(s"fkAudit/$i")(graft.cdc.Reconcile.fkAudit(spark, dir).count())
      time(s"j_star_bucketed/$i")(graft.ops.Joins.multiwayStarBucketed(spark, dir).count())
      time(s"x_pagerank/$i")(graft.operators.GraphOps.pagerank(spark, dir).count())
      time(s"pagerank_edges/$i")(graft.operators.GraphOps.edges(spark, dir).count())
    }
    // stats-catalog faces: how much is the ensure+read vs the join
    for (i <- 1 to 2) {
      time(s"readCatalog/customer/$i")(graft.ops.TableStats.readCatalog(
        spark, dir, "customer", graft.ops.TableStats.CustomerStatCols))
      time(s"cboStarEdges/$i")(graft.ops.TableStats.cboStarEdges(spark, dir))
      time(s"j_cbo_star/$i")(graft.ops.TableStats.cboStarJoin(spark, dir).count())
    }
    // dup-clusters decomposition
    for (i <- 1 to 2) {
      time(s"ngram_pairs/$i")(graft.operators.Dedup.ngramJaccardPairs(spark, dir).count())
      time(s"dup_clusters/$i")(graft.SparkEntry.queries("x_dup_clusters")(spark, dir).count())
    }
    spark.stop()
  }
}
