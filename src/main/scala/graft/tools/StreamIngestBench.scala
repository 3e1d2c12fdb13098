package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming THROUGHPUT artifact (round 12): the T-group operators have
  * correctness specs but the engine never recorded what its ingest
  * paths sustain. This bench drives three live `Trigger.ProcessingTime`
  * queries at factor-N corpus scale and records per-batch latency and
  * a sustained rows/s figure for each, in the FullSurfaceBench artifact
  * discipline (one JSON line, mode-tagged, under `target/`); a fourth
  * face (round-12 addition) drives the incremental aggregate view:
  *
  *  1. `cdc_apply` — the A17 path end-to-end: the `cdc-gen` rate source
  *     → [[graft.cdc.ChangelogApply.applyStream]] (flatMapGroupsWithState
  *     last-wins state) → `foreachBatch` warehouse merge. The behavioral
  *     anchor is the reference's own envelope: its DynamoDB pipeline
  *     ships ≤100 records per 5-second micro-batch
  *     (`cdk_infrastructure/__init__.py:355-356`) ≈ 20 rows/s; the point
  *     of collapsing its four Lambda hops into one streaming query is to
  *     beat that by orders of magnitude on one box.
  *  2. `postings_fold` — a documents file-stream into
  *     [[graft.streaming.IncrementalPostings]] (tokenize → per-batch
  *     term-clustered postings append).
  *  3. `ivfpq_fold` — an embeddings file-stream into
  *     [[graft.streaming.IncrementalIvfPq]] (assign → residual PQ encode
  *     → per-batch cid-partitioned append), quantizers pre-trained by
  *     the batch builder (the production shape: train rarely, ingest
  *     continuously).
  *
  * Waves arrive WHILE the query runs (files land / the source ticks
  * between triggers), so the measured latencies are live micro-batch
  * executions, not a drained backlog.
  *
  * Run: `sbt "runMain graft.tools.StreamIngestBench /root/testdata/sf0.1 10 8"`.
  */
object StreamIngestBench {

  private final case class Face(name: String, totalRows: Long,
      batches: Seq[(Long, Double)], wallSec: Double) {
    def busySec: Double = batches.map(_._2).sum
    def sustained: Double = if (busySec > 0) totalRows / busySec else 0.0
    def p50Ms: Double = percentile(0.5)
    def maxMs: Double = if (batches.isEmpty) 0 else batches.map(_._2).max * 1000
    private def percentile(p: Double): Double = {
      if (batches.isEmpty) return 0
      val s = batches.map(_._2).sorted
      s(math.min(s.size - 1, (p * s.size).toInt)) * 1000
    }
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val nWaves = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config(graft.Sessions.conf(cpus))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val work = java.nio.file.Files.createTempDirectory("streamingest").toString

    // Progress accumulates through a listener, NOT q.recentProgress: that
    // buffer is capped (spark.sql.streaming.numRecentProgressUpdates,
    // default 100) and with 200 ms triggers the many empty-batch entries
    // evict data batches — undercounting waitUntil (spurious timeout) and
    // silently truncating the sustained/p50 statistics at higher nWaves.
    val recorder = new ProgressRecorder
    spark.streams.addListener(recorder)
    def dataBatches(q: StreamingQuery): Seq[(Long, Double)] =
      recorder.batches(q.id).filter(_._1 > 0)
    def processedRows(q: StreamingQuery): Long =
      recorder.batches(q.id).map(_._1).sum
    def waitUntil(cond: => Boolean, what: String, timeoutMs: Long = 300000): Unit = {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
      require(cond, s"timed out waiting for $what")
    }

    // ---- face 1: CDC apply end-to-end --------------------------------
    // eventsPerBatch scales with factor; the key space stays fixed so
    // state updates and the warehouse merge both do real per-key work.
    val cdcPerBatch = 2000 * factor
    val cdcTotal = cdcPerBatch.toLong * nWaves
    val face1 = {
      val t0 = System.nanoTime
      val events = spark.readStream.format("cdc-gen")
        .option("keys", 5000)
        .option("eventsPerBatch", cdcPerBatch)
        .option("removeEvery", 10)
        .option("maxEvents", cdcTotal)
        .load().as[graft.cdc.ChangeEvent]
      val upserts = graft.cdc.ChangelogApply
        .applyStream(events, graft.cdc.ChangelogApply.Mode.ApplyRemove)
      val wh = s"$work/cdc_warehouse"
      val q = upserts.toDF().writeStream
        .option("checkpointLocation", s"$work/cdc_ckpt")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          graft.cdc.ChangelogApply.mergeIntoParquet(batch.sparkSession, batch, wh)
        }
        .trigger(Trigger.ProcessingTime("200 milliseconds"))
        .start()
      try {
        waitUntil(processedRows(q) >= cdcTotal, s"cdc source drained ($cdcTotal)")
      } finally q.stop()
      val merged = spark.read.parquet(wh).count()
      require(merged > 0 && merged <= 5000,
        s"warehouse must hold at most one row per live key, got $merged")
      Face("cdc_apply", cdcTotal, dataBatches(q), (System.nanoTime - t0) / 1e9)
    }
    report(face1)

    // ---- shared wave-feeder for the file-stream faces ----------------
    // Waves land as parquet part-files in the source dir WHILE the query
    // runs; per-wave completion is gated on processed row counts so a
    // wave's latency is a live micro-batch, not backlog drain.
    def driveFileWaves(name: String, waves: Seq[DataFrame],
        mkQuery: String => StreamingQuery): Face = {
      val inDir = s"$work/${name}_in"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
      val t0 = System.nanoTime
      val counts = waves.map(_.count())
      val q = mkQuery(inDir)
      try {
        var cum = 0L
        waves.zip(counts).foreach { case (w, n) =>
          w.write.mode("append").parquet(inDir)
          cum += n
          waitUntil(processedRows(q) >= cum, s"$name wave ($cum rows)")
        }
      } finally q.stop()
      Face(name, counts.sum, dataBatches(q), (System.nanoTime - t0) / 1e9)
    }

    // factor-scaled corpora (the FullSurfaceBench replication rules)
    val r = spark.range(factor).toDF("r")
    val docs = graft.Tables.documents(spark, srcDir)
      .select(col("doc_id"), col("text")).crossJoin(r)
      .withColumn("text",
        concat(col("text"), lit(" zz"), col("doc_id"), lit("x"), col("r")))
      .select((col("doc_id") * factor + col("r")).as("doc_id"), col("text"))
      .localCheckpoint(true, graft.ops.Pin.Level)
    val embs = graft.Tables.embeddings(spark, srcDir).crossJoin(r)
      .select(
        (col("vec_id") * factor + col("r")).as("vec_id"),
        when(col("r") === 0, col("embedding")).otherwise(
          concat(
            slice(col("embedding"), col("r") + 1,
              size(col("embedding")) - col("r")),
            slice(col("embedding"), lit(1), col("r")))).as("embedding"),
        col("label"))
      .localCheckpoint(true, graft.ops.Pin.Level)

    // ---- face 2: incremental postings fold ---------------------------
    val face2 = {
      val root = s"$work/postings_index"
      val waves = (0 until nWaves).map(i =>
        docs.filter(pmod(col("doc_id"), lit(nWaves)) === i))
      val f = driveFileWaves("postings_fold", waves, inDir =>
        graft.streaming.IncrementalPostings.start(
          spark.readStream.schema(docs.schema).parquet(inDir),
          root, s"$work/postings_ckpt",
          Trigger.ProcessingTime("200 milliseconds")))
      val nTerms = graft.streaming.IncrementalPostings.read(spark, root)
        .select(col("term")).distinct().count()
      require(nTerms > 0, "postings index must be non-empty after the folds")
      f
    }
    report(face2)

    // ---- face 3: incremental IVF-PQ fold -----------------------------
    val face3 = {
      val (_, cents, books) = graft.operators.PQ.ensureIvfPqIndex(spark, srcDir)
      val root = s"$work/ivfpq_index"
      val waves = (0 until nWaves).map(i =>
        embs.filter(pmod(col("vec_id"), lit(nWaves)) === i))
      val f = driveFileWaves("ivfpq_fold", waves, inDir =>
        graft.streaming.IncrementalIvfPq.start(
          spark.readStream.schema(embs.schema).parquet(inDir),
          root, s"$work/ivfpq_ckpt", cents, books,
          Trigger.ProcessingTime("200 milliseconds")))
      val nCodes = graft.streaming.IncrementalIvfPq.read(spark, root).count()
      require(nCodes == embs.count(), s"index must hold every vector, got $nCodes")
      f
    }
    report(face3)

    // ---- face 4: incremental aggregate view fold ---------------------
    // the IVM path: per-batch algebraic partials into the shared
    // appender tree; the sustained rate is the cost of keeping a
    // dashboard aggregate corpus-fresh per arriving wave.
    val face4 = {
      val events = graft.Tables.events(spark, srcDir)
        .select(col("event_id"), col("event_type"), col("value")).crossJoin(r)
        .select((col("event_id") * factor + col("r")).as("event_id"),
          col("event_type"), col("value"))
        .localCheckpoint(true, graft.ops.Pin.Level)
      val root = s"$work/agg_view"
      val waves = (0 until nWaves).map(i =>
        events.filter(pmod(col("event_id"), lit(nWaves)) === i))
      val f = driveFileWaves("incr_agg_fold", waves, inDir =>
        graft.streaming.IncrementalAgg.start(
          spark.readStream.schema(events.schema).parquet(inDir),
          root, s"$work/agg_ckpt",
          Trigger.ProcessingTime("200 milliseconds")))
      val total = graft.streaming.IncrementalAgg.read(spark, root)
        .agg(sum(col("cnt"))).collect()(0).getLong(0)
      require(total == events.count(), s"view must count every event, got $total")
      f
    }
    report(face4)

    // ---- artifact ----------------------------------------------------
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def faceJson(f: Face): String = {
      val bs = f.batches.map { case (n, s) => s"""{"rows":$n,"sec":${fmt(s)}}""" }
        .mkString("[", ",", "]")
      s""""${f.name}":{"rows":${f.totalRows},"n_batches":${f.batches.size},"busy_sec":${fmt(f.busySec)},"wall_sec":${fmt(f.wallSec)},"sustained_rows_per_sec":${fmt(f.sustained)},"p50_batch_ms":${fmt(f.p50Ms)},"max_batch_ms":${fmt(f.maxMs)},"batches":$bs}"""
    }
    val modeTag =
      if (graft.Sessions.master(cpus).startsWith("local-cluster")) "lc_" else ""
    val line =
      s"""{"factor":$factor,"n_waves":$nWaves,"master":"${graft.Sessions.master(cpus)}","reference_envelope_rows_per_sec":20,"faces":{${Seq(face1, face2, face3, face4).map(faceJson).mkString(",")}}}"""
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"target/streamingest_${modeTag}f$factor.json"),
      line + "\n")
    println(s"[streamingest] wrote target/streamingest_${modeTag}f$factor.json")
    spark.stop()
  }

  /** Unbounded per-query batch log fed by the listener bus: every
    * micro-batch's (numInputRows, triggerExecution sec), keyed by the
    * query's stable id. The bus is async but waitUntil polls, so the
    * slight delivery lag only delays the observation, never loses it. */
  private final class ProgressRecorder
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    private val byQuery =
      new java.util.concurrent.ConcurrentHashMap[java.util.UUID,
        scala.collection.mutable.ArrayBuffer[(Long, Double)]]()
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val p = e.progress
      val buf = byQuery.computeIfAbsent(p.id,
        _ => scala.collection.mutable.ArrayBuffer.empty)
      buf.synchronized {
        buf += ((p.numInputRows,
          Option(p.durationMs.get("triggerExecution")).map(_.toDouble / 1000)
            .getOrElse(0.0)))
      }
    }
    def batches(id: java.util.UUID): Seq[(Long, Double)] = {
      val buf = byQuery.get(id)
      if (buf == null) Seq.empty else buf.synchronized(buf.toSeq)
    }
  }

  private def report(f: Face): Unit =
    println(f"[streamingest] ${f.name}%-16s ${f.totalRows}%8d rows in " +
      f"${f.batches.size}%3d batches  busy=${f.busySec}%6.1f s  " +
      f"sustained=${f.sustained}%9.0f rows/s  p50=${f.p50Ms}%6.0f ms  " +
      f"max=${f.maxMs}%6.0f ms")
}
