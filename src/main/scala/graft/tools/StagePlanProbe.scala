package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev tool (r19, verdict item 8): dump `explain("formatted")` of
  * INTERNAL stage frames that the final query plan hides behind a
  * `localCheckpoint` LogicalRDD — the pre-checkpoint plan is the
  * evidence for claims about those stages. Run:
  * `sbt "runMain graft.tools.StagePlanProbe <sfDir> <outDir> <suffix> stage1 ..."`
  * producing `<outDir>/<stage>_<suffix>.txt`. */
object StagePlanProbe {

  /** Named internal stage frames. Each builds the SAME frame the query
    * path checkpoints (same code path where visibility allows). */
  def stages(spark: SparkSession, dir: String): Map[String, () => DataFrame] = Map(
    // the pagerank edge derivation (pre-localCheckpoint)
    "x_pagerank_edges" -> (() => graft.operators.GraphOps.edges(spark, dir)),
    // the distinct pair set the edge union symmetrizes (r19: hidden
    // behind the pairs checkpoint in the edges dump)
    "x_pagerank_pairs" -> (() => graft.operators.GraphOps.pairsOf(spark, dir))
  )

  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: StagePlanProbe <sfDir> <outDir> <suffix> <stage>...")
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
    val m = stages(spark, dir)
    names.foreach { name =>
      val df = m(name)()
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), formatted)
      println(s"[stageplan] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
