package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale measurement for the iterative-graph operator: replicate the
  * sf0.1 supply graph f× (disconnected copies with offset node ids —
  * rank mass stays per-copy identical, so correctness is checkable by
  * construction) and time ten supersteps under BOTH serving regimes:
  *
  *   - broadcast face (rank vector broadcast per superstep — the
  *     default below [[graft.operators.GraphOps.BroadcastMaxNodes]]);
  *   - keyed face (co-partitioned, exchange-free edge side — the
  *     big-graph shape, forced via broadcastMaxNodes = 0).
  *
  * Writes `target/graphscale.json`. Run:
  * `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.GraphScaleBench [f...]"`. */
object GraphScaleBench {
  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config(graft.Sessions.conf(cpus))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def baseEdges(): DataFrame = {
      val li = graft.Tables.lineitem(spark, srcDir)
        .select(col("l_orderkey"), col("l_suppkey"))
      val ord = graft.Tables.orders(spark, srcDir)
        .select(col("o_orderkey"), col("o_custkey"))
      val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      pairs.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(pairs.select(col("b").as("src"), col("a").as("dst")))
    }

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime; val r = f
      ((System.nanoTime - t0) / 1e9, r)
    }

    val results = factors.map { f =>
      // f disconnected copies: node ids offset per copy, so per-copy
      // rank distributions are identical — |nodes| and |edges| scale f×
      val off = 100000000L
      val e = baseEdges()
        .crossJoin(spark.range(f).toDF("rep"))
        .select((col("src") + col("rep") * off).as("src"),
          (col("dst") + col("rep") * off).as("dst"))
        .localCheckpoint()
      val nEdges = e.count()
      val (tB, nB) = time(
        graft.operators.GraphOps.pagerankOf(e, 10).count())
      val (tK, nK) = time(
        graft.operators.GraphOps.pagerankOf(e, 10, broadcastMaxNodes = 0).count())
      require(nB == nK, s"faces disagree on node count at f=$f: $nB vs $nK")
      // LINEAGE FLATNESS: 30 supersteps with the 5-step checkpoint
      // cadence must cost ~3× the 10-superstep run — per-superstep time
      // flat in the iteration count (without the cuts, planning cost
      // grows with a 30-joins-deep lineage)
      val (tK30, _) = time(
        graft.operators.GraphOps.pagerankOf(e, 30, broadcastMaxNodes = 0)
          .count())
      val perStep10 = tK / 10.0
      val perStep30 = tK30 / 30.0
      println(f"[graphscale] f=$f edges=$nEdges nodes=$nB " +
        f"broadcast=$tB%.1f s keyed=$tK%.1f s keyed30=$tK30%.1f s " +
        f"(per-step $perStep10%.2f vs $perStep30%.2f s)")
      (f, nEdges, nB, tB, tK, tK30)
    }
    val json = results.map { case (f, ne, nn, tB, tK, tK30) =>
      f"""{"factor":$f,"edges":$ne,"nodes":$nn,"broadcast_sec":$tB%.2f,"keyed_sec":$tK%.2f,"keyed30_sec":$tK30%.2f}"""
    }.mkString("[", ",", "]")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/graphscale.json"),
      s"""{"iterations":10,"src":"$srcDir","runs":$json}""" + "\n")
    println(s"[graphscale] wrote target/graphscale.json")
    spark.stop()
  }
}
