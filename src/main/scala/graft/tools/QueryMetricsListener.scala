package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}

import scala.collection.concurrent.TrieMap

/** Per-job-group task-metric accumulation for the scale benches: spill
  * bytes (memory + disk) and peak execution memory, attributed to the
  * query that set the job group before submitting. Attribution goes
  * stage → job → group (onJobStart carries the submitting thread's
  * `spark.jobGroup.id` and the job's stage ids; onTaskEnd carries the
  * stage id), so it is exact even though the bus is async — callers
  * drain the bus ([[org.apache.spark.graft.ListenerBusBridge]]) before
  * reading.
  *
  * Spill is THE memory-cap truth signal: a query whose working set
  * exceeds executor memory either spills (visible here) or OOMs
  * (visible as an error) — a sweep that records neither was measured
  * with room to spare and proves nothing about cluster-executor-sized
  * heaps. */
final class QueryMetricsListener extends SparkListener {
  private val stageGroup = TrieMap[Int, String]()
  private val spillMemB = TrieMap[String, Long]()
  private val spillDiskB = TrieMap[String, Long]()
  private val peakExecB = TrieMap[String, Long]()

  override def onJobStart(e: SparkListenerJobStart): Unit = {
    val g = Option(e.properties)
      .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
    g.foreach(grp => e.stageIds.foreach(s => stageGroup.put(s, grp)))
  }

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
    for (g <- stageGroup.get(e.stageId); m <- Option(e.taskMetrics)) {
      if (m.memoryBytesSpilled > 0)
        spillMemB.updateWith(g)(v => Some(v.getOrElse(0L) + m.memoryBytesSpilled))
      if (m.diskBytesSpilled > 0)
        spillDiskB.updateWith(g)(v => Some(v.getOrElse(0L) + m.diskBytesSpilled))
      if (m.peakExecutionMemory > 0)
        peakExecB.updateWith(g)(v =>
          Some(math.max(v.getOrElse(0L), m.peakExecutionMemory)))
    }

  /** (spill-mem MB, spill-disk MB, peak single-task execution MB) for a
    * group — zeros when the group never spilled (the usual case). */
  def of(group: String): (Double, Double, Double) = (
    spillMemB.getOrElse(group, 0L) / 1e6,
    spillDiskB.getOrElse(group, 0L) / 1e6,
    peakExecB.getOrElse(group, 0L) / 1e6)
}
