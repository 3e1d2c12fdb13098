package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd, SparkListenerStageCompleted}

/** Throwaway diagnostic: which listener callback carries shuffle-write
  * bytes in this Spark build/local mode. */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val taskBytes = new java.util.concurrent.atomic.AtomicLong(0)
    val taskEvents = new java.util.concurrent.atomic.AtomicLong(0)
    val stageBytes = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        taskEvents.incrementAndGet()
        if (te.taskMetrics != null)
          taskBytes.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (sc.stageInfo.taskMetrics != null)
          stageBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    import spark.implicits._
    val df = spark.range(0, 2000000).select(($"id" % 1000).as("k"), $"id")
      .groupBy("k").count()
    val n = df.collect().length
    Thread.sleep(1500)
    println(s"[probe] rows=$n taskEvents=${taskEvents.get} taskBytes=${taskBytes.get} stageBytes=${stageBytes.get}")
    // now: can the executed plan's own SQL metrics reproduce taskBytes?
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val seen = scala.collection.mutable.Set[SparkPlan]()
    def walk(p: SparkPlan): Unit = if (seen.add(p)) {
      p match {
        case a: AdaptiveSparkPlanExec => println(s"[probe] AQE node, final=${a.executedPlan.getClass.getSimpleName}"); walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case e: ShuffleExchangeLike =>
          println(s"[probe] exchange ${e.getClass.getSimpleName} metrics=${e.metrics.map { case (k, m) => s"$k=${m.value}" }.mkString(", ")}")
        case _ =>
      }
      p.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    println(s"[probe] plan=${df.queryExecution.executedPlan.getClass.getSimpleName}")
    spark.stop()
  }
}
