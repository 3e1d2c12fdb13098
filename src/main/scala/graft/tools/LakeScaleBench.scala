package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurement for the lakehouse maintenance + concurrency ops:
  * replicate orders `factor`× into a MergeTable and measure, against
  * that corpus,
  *
  *   1. OPTIMIZE vs full COMPACT — the claim under test is IO scoping:
  *      optimize's rewrite bytes track the SMALL-FILE debris (constant
  *      as the table grows), compact's track the TABLE. At 100 TB this
  *      is the difference between a routine maintenance tick and a
  *      petabyte job.
  *   2. OCC arbitration — clean commit vs REBASE (loser with a disjoint
  *      footprint: manifest-metadata splice, no data work — should be
  *      near-constant in table size) vs REPLAY (true conflict: the
  *      merge recomputes, costing ~a fresh prepare).
  *
  * Run: `sbt "runMain graft.tools.LakeScaleBench /root/testdata/sf0.1 10"`
  * → prints [lakescale] lines and writes target/lakescale_f{N}.json. */
object LakeScaleBench {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config(graft.Sessions.conf(cpus))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.{MergeTable, Snapshots}

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime; val r = f; (r, (System.nanoTime - t0) / 1e9)
    }
    val work = java.nio.file.Files.createTempDirectory("graft-lakescale")
      .toFile.getAbsolutePath
    val root = s"$work/t"
    val fsDir = new java.io.File(s"$root/files")
    def fileLen(n: String) = new java.io.File(fsDir, n).length()
    def manifestNames = MergeTable.currentManifest(spark, root).map(_.name)

    // ---- corpus: orders ×factor, key density preserved --------------
    val r = spark.range(factor).toDF("r")
    val base = graft.Tables.orders(spark, srcDir).crossJoin(r)
      .select((col("o_orderkey") * factor + col("r")).as("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"),
        graft.functions.DetMath.cents(col("o_totalprice")).as("price_cents"))
    val (_, tCreate) = timed {
      MergeTable.create(spark, root, base, "o_orderkey", nFiles = 32,
        commitTsMillis = 1000L)
    }
    val nRows = MergeTable.read(spark, root).count()
    val tableMB = manifestNames.map(fileLen).sum / 1e6
    println(f"[lakescale] corpus: factor $factor, $nRows rows, $tableMB%.1f MB in 32 files (built in $tCreate%.1f s)")
    val mx = MergeTable.currentManifest(spark, root).map(_.maxKey).max

    // ---- 1. small-file debris → OPTIMIZE vs COMPACT ------------------
    // 12 insert-only micro-merges: the streaming-sink arrival pattern.
    // Debris is ~1/10 of a creation file at ANY factor — the point of
    // the measurement is small-relative-to-the-table, not an absolute
    val debrisRows = math.max(50L, nRows / 320)
    (0 until 12).foreach { i =>
      val lo = mx + 1 + i * debrisRows
      MergeTable.merge(spark, root,
        spark.range(lo, lo + debrisRows)
          .select(lit("c").as("op"), lit(1L).as("seq"),
            col("id").as("o_orderkey"), (col("id") % 1000L).as("o_custkey"),
            lit("O").as("o_orderstatus"), lit(100L).as("price_cents")),
        "o_orderkey", nFiles = 1, commitTsMillis = 2000L + i)
    }
    val beforeOpt = manifestNames.toSet
    val smallBytes = manifestNames.map(fileLen).max / 2
    val debt = MergeTable.optimizeDebt(spark, root, smallBytes)
    val ((packed, carried), tOpt) = timed {
      MergeTable.optimize(spark, root, smallBytes = smallBytes,
        commitTsMillis = 3000L)
    }
    val optMB = manifestNames.filterNot(beforeOpt).map(fileLen).sum / 1e6
    println(f"[lakescale] optimize: debt $debt → packed $packed, carried $carried; " +
      f"$optMB%.2f MB rewritten in $tOpt%.2f s")
    val beforeCompact = manifestNames.toSet
    val (_, tCompact) = timed {
      MergeTable.compact(spark, root, nFiles = 32, commitTsMillis = 4000L)
    }
    val compactMB = manifestNames.filterNot(beforeCompact).map(fileLen).sum / 1e6
    println(f"[lakescale] compact:  $compactMB%.1f MB rewritten in $tCompact%.1f s " +
      f"(optimize moved ${100.0 * optMB / compactMB}%.2f%% of the bytes)")

    // ---- 2. OCC: clean vs rebase vs replay ---------------------------
    def bandUpdate(lo: Long, hi: Long) = {
      // fresh projection per call: prepared handles retain the frame
      MergeTable.read(spark, root)
        .where(col("o_orderkey").between(lo, hi))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          (col("price_cents") + 1L).as("price_cents"))
        .withColumn("op", lit("u")).withColumn("seq", lit(1L))
    }
    val band = mx / 50
    val (hClean, tPrep) = timed {
      MergeTable.prepareMerge(spark, root, bandUpdate(1L, band), "o_orderkey")
    }
    val (oClean, tClean) = timed {
      MergeTable.commitPrepared(spark, root, hClean, commitTsMillis = 5000L)
    }
    // two writers from ONE snapshot, disjoint bands → loser rebases
    val hA = MergeTable.prepareMerge(spark, root,
      bandUpdate(mx / 2, mx / 2 + band), "o_orderkey")
    val hB = MergeTable.prepareMerge(spark, root,
      bandUpdate(mx / 4 * 3, mx / 4 * 3 + band), "o_orderkey")
    MergeTable.commitPrepared(spark, root, hA, commitTsMillis = 6000L)
    val (oRebase, tRebase) = timed {
      MergeTable.commitPrepared(spark, root, hB, commitTsMillis = 7000L)
    }
    // two writers on the SAME band → loser replays
    val hC = MergeTable.prepareMerge(spark, root,
      bandUpdate(1L, band), "o_orderkey")
    val hD = MergeTable.prepareMerge(spark, root,
      bandUpdate(1L, band), "o_orderkey")
    MergeTable.commitPrepared(spark, root, hC, commitTsMillis = 8000L)
    val (oReplay, tReplay) = timed {
      MergeTable.commitPrepared(spark, root, hD, commitTsMillis = 9000L)
    }
    require(oClean.path == "clean" && oRebase.path == "rebased" &&
      oReplay.path == "replayed",
      s"occ paths: $oClean / $oRebase / $oReplay")
    println(f"[lakescale] occ: prepare $tPrep%.2f s; clean commit $tClean%.2f s; " +
      f"rebase $tRebase%.2f s (metadata-only); replay $tReplay%.2f s (~prepare)")
    val gens = Snapshots.generations(spark, root)
    println(s"[lakescale] history: ${gens.size} committed generations")

    val json =
      f"""{"factor":$factor,"rows":$nRows,"table_mb":$tableMB%.1f,
         |"optimize":{"s":$tOpt%.2f,"mb":$optMB%.2f,"packed":$packed,"carried":$carried},
         |"compact":{"s":$tCompact%.2f,"mb":$compactMB%.1f},
         |"occ":{"prepare_s":$tPrep%.2f,"clean_s":$tClean%.2f,"rebase_s":$tRebase%.2f,"replay_s":$tReplay%.2f}}""".stripMargin.replace("\n", "")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"target/lakescale_f$factor.json"), json)
    println(s"[lakescale] wrote target/lakescale_f$factor.json")
    // the work dir is disposable measurement state
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(work))
    spark.stop()
  }
}
