package graft

import org.apache.spark.sql.SparkSession

/** Master-mode plumbing shared by every driver-invoked main.
  *
  * `SPARK_GRAFT_MASTER=local-cluster[2,4,4096]` switches any main from
  * the default single-JVM `local[cpus]` to Spark's pseudo-cluster: a
  * standalone Master + Worker in the driver JVM and each executor as a
  * SEPARATE `CoarseGrainedExecutorBackend` process. That is the mode
  * where task binaries, broadcasts, block fetches and accumulator
  * round-trips actually cross process boundaries — the closest a
  * single box gets to the reference's own multi-process topology
  * (four Lambda hops + a DMS instance). Every plan-node payload the
  * engine ships in tasks (IVF codebooks, SRP hyperplanes, PQ
  * sub-codebooks) and every listener-attributed metric must survive
  * it unchanged.
  *
  * In local-cluster mode the forked driver's own `java.class.path`
  * (app classes + /opt/spark/jars, all machine-local paths) is handed
  * to executors via `spark.executor.extraClassPath`; the Worker's own
  * launcher classpath lacks the application classes, and there is no
  * shared-filesystem jar distribution step in this environment.
  *
  * ALSO export `SPARK_SCALA_VERSION=2.13` for local-cluster runs: the
  * Worker spawns executors through the launcher library directly (not
  * `bin/spark-class`, which sources `load-spark-env.sh` to set it), and
  * without the variable the launcher probes `$SPARK_HOME/launcher/
  * target/scala-*` build dirs — absent in a binary dist — and dies with
  * "Cannot find any build directories." before the executor starts.
  */
object Sessions {

  /** The resolved master for this run — env override or single-JVM
    * default at `cpus` threads. */
  def master(cpus: String): String =
    sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")

  /** [[master]] plus any mode-dependent config, as a builder-ready map
    * (drop-in for the `.master(...)` call in each main).
    *
    * `SPARK_GRAFT_EXTRA_CONF` (r19): optional `key=value;key=value`
    * overrides appended last — the env-parameterized knob the
    * optimization rounds require for scale-dependent settings, so a
    * deployment can tune (e.g. AQE advisory sizes, shuffle codec)
    * without a rebuild while the driver's default bench stays on stock
    * configuration. */
  def conf(cpus: String): Map[String, String] = {
    val m = master(cpus)
    // the library's SQL surface (time travel, merge-table DML, the
    // manifest FileIndex) rides the standard extensions hook — inert
    // until a table name is registered, so it is safe everywhere
    val base = Map("spark.master" -> m,
      "spark.sql.extensions" -> "graft.GraftExtensions")
    val mode =
      if (m.startsWith("local-cluster"))
        base + ("spark.executor.extraClassPath" -> sys.props("java.class.path"))
      else base
    val extra = sys.env.getOrElse("SPARK_GRAFT_EXTRA_CONF", "")
      .split(';').iterator.map(_.trim).filter(_.contains('='))
      .map { kv => val i = kv.indexOf('='); kv.take(i) -> kv.drop(i + 1) }
      .toMap
    mode ++ extra
  }
}
