package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.AtomicLong

/** Dev probe for the r19 optimization round (guide §1: measure first,
  * verdict item 2: attack the per-query job floor). For every declared
  * query it records wall time plus the number of Spark JOBS, STAGES and
  * TASKS the warm run launches — the job/stage count is the per-query
  * scheduling overhead that dominates the sub-second tail at sf0.1.
  * Run: `sbt "runMain graft.tools.JobFloorProbe /root/testdata/sf0.1"`.
  * Output: one line per query, sorted by job count, plus a TSV dump to
  * target/jobfloor.tsv for offline ranking. */
object JobFloorProbe {
  final class CountListener extends SparkListener {
    val jobs = new AtomicLong(0)
    val stages = new AtomicLong(0)
    val tasks = new AtomicLong(0)
    override def onJobStart(e: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    def snap(): (Long, Long, Long) = (jobs.get, stages.get, tasks.get)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only: Set[String] = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config(graft.Sessions.conf(cpus))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    val listener = new CountListener
    sc.addSparkListener(listener)

    // same warm-up + untimed ETL builds as Bench so per-query numbers
    // measure steady-state query cost
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    graft.Tables.events(spark, dir).count()
    spark.sql("SHOW DATABASES").collect()
    spark.range(100)
      .join(org.apache.spark.sql.functions.broadcast(spark.range(10)), "id")
      .count()
    graft.ops.Layout.ensureBucketedStar(spark, dir)
    graft.operators.Similarity.ensureSrpIndex(spark, dir)
    graft.operators.Similarity.ensureIvfIndex(spark, dir)
    graft.operators.PQ.ensureIvfPqIndex(spark, dir)
    graft.operators.PQ.ensurePqIndex(spark, dir)
    graft.operators.Multimodal.ensureMediaLayout(spark, dir)
    graft.operators.Dedup.ensureMinhashIndex(spark, dir)
    graft.operators.Dedup.ensureClustersIndex(spark, dir)
    graft.operators.Search.ensurePostingsIndex(spark, dir)
    graft.ops.Layout.ensureDayLayout(spark, dir)
    graft.ops.Layout.ensureZOrderLayout(spark, dir)
    graft.ops.Layout.ensureHilbertLayout(spark, dir)
    graft.operators.Subword.ensureVocab(spark, dir)
    graft.ops.TableStats.ensureCatalog(spark, dir,
      "customer", graft.ops.TableStats.CustomerStatCols)

    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only.contains(n))
    val rows = names.flatMap { name =>
      val fn = graft.SparkEntry.queries(name)
      try {
        fn(spark, dir).count() // cold run: plan+codegen warm-up, untimed
        org.apache.spark.graft.ListenerBusBridge.waitUntilEmpty(sc)
        val (j0, s0, t0) = listener.snap()
        val w0 = System.nanoTime()
        fn(spark, dir).count()
        val sec = (System.nanoTime() - w0) / 1e9
        org.apache.spark.graft.ListenerBusBridge.waitUntilEmpty(sc)
        val (j1, s1, t1) = listener.snap()
        Some((name, sec, j1 - j0, s1 - s0, t1 - t0))
      } catch {
        case e: Throwable =>
          println(s"[floor] $name FAILED: ${e.toString.take(120)}")
          None
      }
    }
    val tsv = rows.sortBy(-_._3)
      .map { case (n, sec, j, s, t) => f"$n\t$sec%.3f\t$j\t$s\t$t" }
    println("query\tsec\tjobs\tstages\ttasks")
    tsv.foreach(println)
    val total = rows.map(_._2).sum
    val totJobs = rows.map(_._3).sum
    println(f"[floor] total=${total}%.2f s jobs=$totJobs over ${rows.size} queries")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/jobfloor.tsv"),
      ("query\tsec\tjobs\tstages\ttasks" +: tsv).mkString("", "\n", "\n"))
    spark.stop()
  }
}
