package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd, SparkListenerStageCompleted}

/** Throwaway diagnostic: which listener callback carries shuffle-write
  * bytes in this Spark build/local mode, and whether the executed plan's
  * own SQL metrics agree — run against the same query shapes
  * RelScaleBench measures. */
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
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          taskBytes.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = ()
    })

    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def walkReport(df: DataFrame): Long = {
      val seen = scala.collection.mutable.Set[SparkPlan]()
      var bytes = 0L
      def walk(p: SparkPlan): Unit = if (seen.add(p)) {
        p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: QueryStageExec => walk(q.plan)
          case e: ShuffleExchangeLike =>
            val b = e.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(-1L)
            println(s"[probe]   exchange ${e.getClass.getSimpleName} bytes=$b")
            bytes += math.max(0L, b)
          case _ =>
        }
        p.children.foreach(walk)
      }
      walk(df.queryExecution.executedPlan)
      bytes
    }

    def probe(name: String)(mk: => DataFrame): Unit = {
      val before = taskBytes.get
      val df = mk
      df.collect()
      Thread.sleep(1000)
      val tb = taskBytes.get - before
      val pb = walkReport(df)
      println(s"[probe] $name taskBytes=$tb planBytes=$pb")
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("WindowGroupLimit") || l.contains("Exchange"))
        .foreach(l => println(s"[probe]   plan: ${l.trim.take(120)}"))
    }

    val scaleDir = s"${sys.props("java.io.tmpdir")}/graft_relscale10"
    probe("topk/heap")(graft.ops.Aggregates.topKFromEvents(spark,
      spark.read.parquet(s"$scaleDir/events_flat.parquet"), k = 3))
    probe("topk/window") {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.LongType
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value_cents").desc, col("event_id"))
      spark.read.parquet(s"$scaleDir/events_flat.parquet")
        .select(col("event_type"), col("event_id"),
          graft.functions.DetMath.cents(col("value")).as("value_cents"))
        .withColumn("rank", row_number().over(w).cast(LongType))
        .filter(col("rank") <= 3)
        .select(col("event_type"), col("rank"), col("event_id"),
          col("value_cents"))
        .orderBy(col("event_type"), col("rank"))
    }
    spark.stop()
  }
}
