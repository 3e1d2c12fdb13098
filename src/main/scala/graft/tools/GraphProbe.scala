package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe for the iterative-graph operator: stage timings and the
  * superstep plan shape (what re-shuffles per iteration vs rides a
  * preserved partitioning). Run:
  * `sbt "runMain graft.tools.GraphProbe /root/testdata/sf0.1"`. */
object GraphProbe {
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
      println(f"[graph] $name: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    spark.read.parquet(s"$dir/lineitem.parquet").count() // warm-up
    // cold end-to-end, then warm (edge derivation amortized by the JVM)
    time("pagerank/cold")(graft.operators.GraphOps.pagerank(spark, dir).count())
    time("pagerank/warm")(graft.operators.GraphOps.pagerank(spark, dir).count())
    // shuffle volume of the superstep loop: one iteration vs ten on the
    // same checkpointed edges isolates the per-iteration cost
    import org.apache.spark.sql.functions.col
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
    val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(pairs.select(col("b").as("src"), col("a").as("dst")))
    time("edges/derive+checkpoint") {
      graft.operators.GraphOps.pagerankOf(edges, 0).count()
    }
    time("supersteps/1")(graft.operators.GraphOps.pagerankOf(edges, 1).count())
    time("supersteps/10")(graft.operators.GraphOps.pagerankOf(edges, 10).count())
    time("supersteps/10/keyed")(
      graft.operators.GraphOps.pagerankOf(edges, 10, broadcastMaxNodes = 0).count())
    val plan = graft.operators.GraphOps.pagerankOf(edges, 2, broadcastMaxNodes = 0)
    println(plan.queryExecution.executedPlan.toString.take(9000))
    spark.stop()
  }
}
