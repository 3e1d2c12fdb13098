package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators: bucketing and partitioned layout — the two
  * levers that remove shuffles and scans at warehouse scale.
  *
  *  - **Bucketing**: writing both sides of a recurring big-big join
  *    bucketed by the join key means every subsequent join is
  *    shuffle-free (Spark reads co-located buckets). At 100 TB the
  *    lineitem⋈orders shuffle is the single largest data movement in the
  *    star queries; bucketing amortizes it into the write.
  *  - **Date partitioning**: `partitionBy(day)` on event/fact tables lets
  *    time-range predicates prune entire directories at the file index —
  *    the scan never opens irrelevant files (PartitionFilters in the
  *    plan, as opposed to PushedFilters which still touch footers).
  */
object Layout {

  /** The warehouse namespace (the reference's Redshift `db.schema.table`,
    * `load_s3_files_…/handler.py:72-85`, re-expressed over the Spark
    * session catalog: `spark_catalog.<db>.<table>`). */
  val WarehouseDb = "graft_wh"

  /** Idempotent namespace DDL — `CREATE SCHEMA IF NOT EXISTS` (the
    * reference issues exactly this before loading, handler.py:76).
    * Memoized per JVM (r19): the DDL is a metastore round-trip and
    * schemas are never dropped in-process. */
  private val ensuredDbs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def ensureNamespace(spark: SparkSession, db: String = WarehouseDb): Unit =
    if (!ensuredDbs.contains(db)) {
      spark.sql(s"CREATE SCHEMA IF NOT EXISTS spark_catalog.`$db`")
      ensuredDbs.add(db)
    }

  /** A catalog-safe tag for a scale-factor directory, so each sf gets its
    * own warehouse tables (`graft_wh.lineitem_b_root_testdata_sf0_01`). */
  def sfTag(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_|_$", "")

  /** Filesystem home of one materialized index kind for one sf dir —
    * the single place the index root lives (under the build dir, never
    * the read-only testdata; absolute so a CWD change can't split an
    * index across roots). Shared by the SRP/IVF/media/MinHash/postings
    * indexes. */
  def indexPath(kind: String, dir: String): String =
    new java.io.File(s"target/graft-index/${kind}_${sfTag(dir)}")
      .getAbsolutePath

  /** Write a frame bucketed+sorted by `key` as a managed table. */
  def writeBucketed(df: DataFrame, key: String, buckets: Int,
      table: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Signature of a source dataset on disk (total bytes + newest mtime) —
    * the freshness token for idempotent materializations. */
  def dataSig(path: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
      else Seq(f)
    val fs = walk(new java.io.File(path))
    s"${fs.map(_.length).sum}_${fs.map(_.lastModified).foldLeft(0L)(math.max)}"
  }

  /** The shared signature-gated materialization: run `build` only when
    * `path` lacks a `_GRAFT_SRC_SIG` matching `sig`; the sig is written
    * AFTER the build, so a partial build (crash mid-write) never passes
    * the gate on the next run. Used by every materialized layout/index
    * (bucketed star via table properties; SRP/IVF/media via this). */
  def ensureSigGated(path: String, sig: String)(build: => Unit): String = {
    val sigFile = new java.io.File(path, "_GRAFT_SRC_SIG")
    val fresh = sigFile.isFile &&
      new String(java.nio.file.Files.readAllBytes(sigFile.toPath)) == sig
    if (!fresh) {
      build
      java.nio.file.Files.write(sigFile.toPath, sig.getBytes)
    }
    path
  }

  /** Idempotently materialize `df` (read from `srcPath`) as a bucketed
    * warehouse table: a no-op when the table already exists AND its
    * recorded source signature matches the data on disk; a rebuild
    * otherwise. This is the reference's "create table if not exists,
    * then load" made safe against the source being regenerated. */
  /** Per-JVM freshness memo (r19): table name → the source sig it was
    * last VERIFIED fresh against through the catalog. The sig itself is
    * recomputed from the filesystem on every call (cheap walk), so a
    * regenerated source still invalidates; the memo only skips
    * re-asking the metastore the same question about an immutable
    * materialization — measured 0.33 s per warm ensureBucketedStar,
    * paid by every bucketed-layout query in the process. */
  private val verifiedTableSigs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def ensureBucketedTable(spark: SparkSession, srcPath: String,
      df: => DataFrame, key: String, buckets: Int, table: String): Unit = {
    val sig = dataSig(srcPath)
    if (verifiedTableSigs.get(table) == sig) return
    val fresh = spark.catalog.tableExists(table) &&
      spark.sql(s"SHOW TBLPROPERTIES $table").collect()
        .exists(r => r.getString(0) == "graft.src.sig" && r.getString(1) == sig)
    if (!fresh) {
      // the default session catalog is in-memory (per-JVM): a previous
      // process may have left this managed table's files on disk with no
      // catalog entry here. saveAsTable refuses non-empty locations for
      // new managed tables, so clear the catalog-orphaned location first.
      if (!spark.catalog.tableExists(table)) {
        val parts = table.split('.')
        val orphan = new org.apache.hadoop.fs.Path(
          spark.catalog.getDatabase(parts(parts.length - 2)).locationUri,
          parts.last)
        val fs = orphan.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(orphan, true)
      }
      writeBucketed(df, key, buckets, table)
      spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES ('graft.src.sig'='$sig')")
    }
    verifiedTableSigs.put(table, sig)
  }

  /** Materialize the star's two big tables bucketed by their join key —
    * the write-side amortization of the lineitem⋈orders shuffle. Returns
    * the 3-part table names. 16 buckets here; at a 100 TB deployment the
    * bucket count scales with cluster width (e.g. 2–4× executor count),
    * the mechanics are identical. */
  def ensureBucketedStar(spark: SparkSession, dir: String,
      buckets: Int = 16): (String, String) = {
    ensureNamespace(spark)
    val tag = sfTag(dir)
    val li = s"spark_catalog.$WarehouseDb.lineitem_b_$tag"
    val ord = s"spark_catalog.$WarehouseDb.orders_b_$tag"
    ensureBucketedTable(spark, s"$dir/lineitem.parquet",
      graft.Tables.lineitem(spark, dir), "l_orderkey", buckets, li)
    ensureBucketedTable(spark, s"$dir/orders.parquet",
      graft.Tables.orders(spark, dir), "o_orderkey", buckets, ord)
    (li, ord)
  }

  /** Join two tables previously bucketed on the same key with the same
    * bucket count: plans as a sort-merge join with NO Exchange on either
    * side (asserted in LayoutSpec). */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))

  /** Write events partitioned by calendar day (directory per day).
    *
    * The day key is derived TIMEZONE-FREE from the epoch instant
    * (micros ÷ 86 400e6 → days since 1970-01-01, rendered via a
    * DATE→STRING cast, which never consults the session zone) — NOT via
    * `date_format(ts, …)`, whose output shifts with
    * `spark.sql.session.timeZone`. The layout is built by whichever main
    * touches it first (Bench, Verify, a test) and silently reused by the
    * others, so its day boundaries must be a pure function of the data:
    * a zone-dependent build would make `s_day_pruned` diverge from the
    * DuckDB oracle's naive-UTC `CAST(ts AS DATE)` on any non-UTC JVM. */
  def writePartitionedByDay(events: DataFrame, dir: String,
      tsCol: String = "ts"): Unit =
    events.withColumn("day",
        date_add(lit(java.sql.Date.valueOf("1970-01-01")),
          // floor, not cast-truncation: negative micros (pre-1970) must
          // round DOWN to match the oracle's CAST(ts AS DATE) floor
          floor(unix_micros(col(tsCol)) / 86400000000L).cast("int"))
          .cast("string"))
      .write.mode("overwrite").partitionBy("day").parquet(dir)

  /** Read one day back — prunes to a single partition directory. */
  def readDay(spark: SparkSession, dir: String, day: String): DataFrame =
    spark.read.parquet(dir).filter(col("day") === day)

  /** Equi-width monotone mapping of `[lo, hi]` into u16 — the
    * dimension normalization feeding [[graft.functions.ZOrder64]].
    * LONG arithmetic throughout: micros-scale spans × 65535 stay under
    * 2⁶³, whereas the double form loses monotonicity past 2⁵³ and a
    * non-monotone map silently breaks tile locality. Equi-width is the
    * honest cheap choice (min/max come from stats the warehouse already
    * has); heavily skewed dimensions want equi-DEPTH boundaries from a
    * quantile sample — same interleave, different normalization. */
  private[graft] def norm16(c: org.apache.spark.sql.Column, lo: Long, hi: Long) =
    normBits(c, lo, hi, 16)

  /** [[normBits]] for UNBOUNDED domains — the normalization a STRING
    * dimension's prefix embedding needs: [[graft.functions
    * .StringPrefix64]] values span nearly the full signed-Long domain,
    * where [[normBits]]' `span × scale` product overflows and refuses.
    * Instead of refusing, PRE-SHIFT: both the value and the bounds drop
    * their low `s` bits (arithmetic shift = floor division by 2^s —
    * monotone, so tile ordering is preserved exactly), with `s` sized
    * from the ACTUAL span so narrow domains keep full resolution:
    * s = max(0, spanBits − (62 − bits)). A full-domain span at 16 bits
    * shifts by 18 (keeping the top ~46 bits of the embedding — far
    * beyond the 8-byte prefix's discriminating power); a narrow span
    * (statuses, short enums) shifts by 0 and is exactly [[normBits]].
    * A mixed-sign span wider than Long itself (subtractExact overflow)
    * is treated as 64-bit — shifted, never garbage. */
  private[graft] def normBitsAuto(c: org.apache.spark.sql.Column,
      lo: Long, hi: Long, bits: Int) = {
    require(bits >= 1 && bits <= 62, s"normBitsAuto: bit budget $bits")
    if (hi <= lo) lit(0L)
    else {
      val spanBits =
        try {
          val span = Math.subtractExact(hi, lo)
          64 - java.lang.Long.numberOfLeadingZeros(span)
        } catch { case _: ArithmeticException => 64 }
      val s = math.max(0, spanBits - (62 - bits))
      if (s == 0) normBits(c, lo, hi, bits)
      else normBits(shiftright(c.cast("long"), s), lo >> s, hi >> s, bits)
    }
  }

  /** [[norm16]] generalized to an arbitrary bit budget — the dimension
    * normalization feeding [[graft.functions.InterleaveN]]'s n-way
    * split (21 bits at n=3, 15 at n=4). The `span × (2^bits − 1)`
    * product must stay under 2⁶³ for the long arithmetic to hold its
    * monotonicity guarantee, so an oversized span refuses loudly (pre-
    * scale the dimension — epoch micros → seconds — instead of letting
    * a silent overflow scramble tile locality). */
  private[graft] def normBits(c: org.apache.spark.sql.Column,
      lo: Long, hi: Long, bits: Int) = {
    import org.apache.spark.sql.graft.ColumnBridge
    require(bits >= 1 && bits <= 62, s"normBits: bit budget $bits")
    val scale = (1L << bits) - 1L
    if (hi <= lo) lit(0L)
    else {
      // subtractExact: a mixed-sign span wider than Long itself would
      // wrap NEGATIVE and sail through the ≤ check below — the exact
      // silent-scramble this guard exists to refuse
      val span =
        try Math.subtractExact(hi, lo)
        catch { case _: ArithmeticException =>
          throw new IllegalArgumentException(
            s"normBits: span [$lo, $hi] overflows Long — pre-scale the " +
              "dimension before clustering on it")
        }
      require(span <= Long.MaxValue / scale,
        s"normBits: span $span × $scale overflows — pre-scale the " +
          "dimension (e.g. micros → seconds) before clustering on it")
      ColumnBridge.column(
        new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          ColumnBridge.expression((c.cast("long") - lit(lo)) * lit(scale)),
          ColumnBridge.expression(lit(hi - lo))))
    }
  }

  /** Write events Z-ORDER clustered on (user_id, ts): both dimensions
    * normalized to u16, Morton-interleaved (codegen'd [[graft.functions
    * .ZOrder64]]), range-partitioned and sorted by the code. Row groups
    * become ~square tiles in (user, time) space, so parquet min/max
    * stats prune for predicates on EITHER dimension — one clustered
    * copy serves the whole (user, time) query family, where a linear
    * sort serves exactly one. The interleave is a write-side cost only:
    * queries read the ORIGINAL columns; the tiles do their work through
    * footer stats alone. */
  def writeZOrdered(events: DataFrame, dir: String, files: Int = 32): Unit = {
    import graft.functions.ZOrder64.zorder64
    val spark = events.sparkSession
    val b = events.agg(
      min(col("user_id")), max(col("user_id")),
      min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head
    (0 until 4).foreach(i => require(!b.isNullAt(i),
      s"writeZOrdered($dir): empty or all-null " +
        s"${if (i < 2) "user_id" else "ts"} — no bounds to normalize against"))
    val z = zorder64(
      norm16(col("user_id"), b.getLong(0), b.getLong(1)),
      norm16(unix_micros(col("ts")), b.getLong(2), b.getLong(3)))
    // the layout exists FOR stats pruning, so the timestamp column must
    // be written as INT64 micros: Spark's legacy INT96 default cannot
    // carry parquet predicate pushdown at all (a z-layout written as
    // INT96 silently prunes in one dimension only)
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.get(key, "INT96")
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try events.repartitionByRange(files, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(dir)
    finally spark.conf.set(key, prev)
  }

  /** EQUI-DEPTH z-order clustering — the skew-robust variant the
    * equi-width doc promises: dimensions map through their exact
    * `buckets`-quantile boundaries instead of min/max, so a dimension
    * where 80% of rows share a handful of values still spreads across
    * ~80% of the buckets and range predicates INSIDE the hot region
    * keep pruning (under equi-width they collapse into one bucket and
    * the tiles degenerate to a 1-d sort on the other dimension —
    * measured in ZOrderSpec's skewed fixture). Boundaries come from one
    * exact-percentile pass (at 100 TB a quantile SAMPLE is the standard
    * stand-in; the interleave is unchanged). The per-row bucket lookup
    * is a fold over the boundary literals — layout-build cost only,
    * and a codegen'd binary-search expression is the production
    * refinement if build throughput ever matters. */
  def writeZOrderedEquiDepth(events: DataFrame, dir: String,
      files: Int = 32, buckets: Int = 256): Unit = {
    import graft.functions.ZOrder64.zorder64
    val spark = events.sparkSession
    val qs = (1 until buckets).map(_.toDouble / buckets).toArray
    val qCol = array(qs.map(lit).toIndexedSeq: _*)
    val b = events.select(
      percentile(col("user_id"), qCol).as("ub"),
      percentile(unix_micros(col("ts")), qCol).as("tb")).head
    Seq("user_id" -> 0, "ts" -> 1).foreach { case (d, i) =>
      require(!b.isNullAt(i),
        s"writeZOrderedEquiDepth($dir): empty or all-null $d — " +
          "no quantile boundaries to bucket against") }
    def bucketOf(c: org.apache.spark.sql.Column, bounds: Seq[Double]) =
      aggregate(array(bounds.map(lit).toIndexedSeq: _*), lit(0L),
        (acc, bd) => acc + when(c.cast("double") >= bd, 1L).otherwise(0L))
    val z = zorder64(
      bucketOf(col("user_id"), b.getSeq[Double](0)),
      bucketOf(unix_micros(col("ts")), b.getSeq[Double](1)))
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.get(key, "INT96")
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try events.repartitionByRange(files, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(dir)
    finally spark.conf.set(key, prev)
  }

  /** Materialized z-ordered events layout (freshness-gated like the
    * other layouts). */
  def ensureZOrderLayout(spark: SparkSession, dir: String): String = {
    val path = indexPath("events_zorder", dir)
    // v2: INT64-micros timestamps — invalidates any INT96 v1 layout
    val sig = s"v2_${dataSig(s"$dir/events.parquet")}"
    ensureSigGated(path, sig) {
      writeZOrdered(graft.Tables.events(spark, dir), path)
    }
  }

  /** Write events HILBERT-clustered on (user_id, ts): same u16
    * normalization, same range-partition + in-partition sort machinery
    * as [[writeZOrdered]], only the interleave swapped for the
    * continuous curve ([[graft.functions.Hilbert32]] — no power-of-two
    * locality seams, so a query box decomposes into fewer contiguous
    * key runs = fewer row groups touched; measured head-to-head in
    * HilbertSpec). Write cost is identical to the z layout. */
  def writeHilbert(events: DataFrame, dir: String, files: Int = 32): Unit = {
    import graft.functions.Hilbert32.hilbert32
    val spark = events.sparkSession
    val b = events.agg(
      min(col("user_id")), max(col("user_id")),
      min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head
    (0 until 4).foreach(i => require(!b.isNullAt(i),
      s"writeHilbert($dir): empty or all-null " +
        s"${if (i < 2) "user_id" else "ts"} — no bounds to normalize against"))
    val h = hilbert32(
      norm16(col("user_id"), b.getLong(0), b.getLong(1)),
      norm16(unix_micros(col("ts")), b.getLong(2), b.getLong(3)))
    // INT64-micros timestamps — same pushdown rationale as writeZOrdered
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.get(key, "INT96")
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try events.repartitionByRange(files, h)
      .sortWithinPartitions(h)
      .write.mode("overwrite").parquet(dir)
    finally spark.conf.set(key, prev)
  }

  /** Materialized Hilbert-clustered events layout (freshness-gated). */
  def ensureHilbertLayout(spark: SparkSession, dir: String): String = {
    val path = indexPath("events_hilbert", dir)
    val sig = s"v1_${dataSig(s"$dir/events.parquet")}"
    ensureSigGated(path, sig) {
      writeHilbert(graft.Tables.events(spark, dir), path)
    }
  }

  /** Materialized day-partitioned events layout (freshness-gated like
    * the other indexes): the write-side organization that turns every
    * time-range predicate into directory pruning. At 100 TB of events
    * this is THE difference between scanning a month and opening one
    * day's files. */
  def ensureDayLayout(spark: SparkSession, dir: String): String = {
    val path = indexPath("events_by_day", dir)
    // v2: TZ-free day derivation — the version token invalidates any
    // layout a pre-v2 (session-TZ-dependent) build left behind
    val sig = s"v2_${dataSig(s"$dir/events.parquet")}"
    ensureSigGated(path, sig) {
      writePartitionedByDay(graft.Tables.events(spark, dir), path)
    }
  }

  /** Materialized CALENDAR DIMENSION over the event data's day domain —
    * the standard warehouse date dim, one row per distinct day with
    * derived attributes. `dow_idx` is computed arithmetically from the
    * epoch-day count (1970-01-01 was a Thursday; 0 = Sunday … 6 =
    * Saturday) rather than via an engine dayofweek() whose numbering
    * differs between engines — so the DuckDB oracle can replay the
    * attribute exactly. Joining a day-partitioned fact to this dim on
    * `day` with a filter on a dim ATTRIBUTE is the canonical dynamic
    * partition pruning shape ([[graft.ops.Joins.dppWeekend]]). */
  def ensureCalendarDim(spark: SparkSession, dir: String): String = {
    val path = indexPath("calendar_dim", dir)
    val sig = s"v1_${dataSig(s"$dir/events.parquet")}"
    ensureSigGated(path, sig) {
      graft.Tables.events(spark, dir)
        .select(floor(unix_micros(col("ts")) / 86400000000L)
          .cast("int").as("epoch_day"))
        .distinct()
        .select(
          date_add(lit(java.sql.Date.valueOf("1970-01-01")),
            col("epoch_day")).cast("string").as("day"),
          col("epoch_day").cast("long").as("epoch_day"),
          (((col("epoch_day") % 7) + 7 + 4) % 7).cast("int").as("dow_idx"))
        .coalesce(1)
        .write.mode("overwrite").parquet(path)
    }
  }
}
