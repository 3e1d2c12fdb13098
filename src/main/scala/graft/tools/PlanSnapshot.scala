package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: dump `explain("formatted")` of NAMED declared queries to
  * one file per query — the before/after plan evidence an optimization
  * round commits under `plans/rNN/`. Run:
  * `sbt "runMain graft.tools.PlanSnapshot <sfDir> <outDir> <suffix> q1 q2 ..."`
  * producing `<outDir>/<q>_<suffix>.txt`. */
object PlanSnapshot {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanSnapshot <sfDir> <outDir> <suffix> <query>...")
    val dir = args(0); val outDir = args(1); val suffix = args(2)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config(graft.Sessions.conf(cpus))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), formatted)
      println(s"[plan] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
