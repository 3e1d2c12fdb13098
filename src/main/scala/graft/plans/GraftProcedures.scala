package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.streaming.{MergeTable, Snapshots}

/** The SQL MAINTENANCE verbs of the lake — Spark 4's stored-procedure
  * surface (`CALL <catalog>.<proc>(...)`, SPARK-44167; the same shape
  * as Iceberg's `CALL system.rewrite_data_files`) over the
  * [[graft.streaming.MergeTable]] maintenance API. This closes the one
  * gap in the catalog's SQL citizenship: a user could CREATE / INSERT /
  * MERGE / DELETE / UPDATE / ALTER / SELECT-AS-OF a table in plain SQL
  * but had to drop to Scala to compact or vacuum the SAME table — the
  * operations the reference declares as out-of-band lifecycle rules
  * (`cdk_infrastructure/__init__.py:300-307`, the S3 retention rule)
  * become first-class statements here:
  *
  * {{{
  *   CALL lake.optimize('orders', small_bytes => 1048576)
  *   CALL lake.compact('orders', n_files => 8)
  *   CALL lake.vacuum('orders', retain => 1)
  *   CALL lake.rollback('orders', generation => 3)
  *   CALL lake.analyze('orders')
  * }}}
  *
  * Each procedure returns the SAME metrics row its API face returns
  * (packed/carried counts, removed generations, the new generation id),
  * served as a [[LocalScan]] — `CALL` composes like a one-row query.
  * Spark's `BindProcedures` fills named/defaulted arguments, so the
  * SQL surface and the Scala defaults cannot drift: the default VALUES
  * live in the parameter declarations below and are the API's own.
  *
  * Execution model: Spark's `InvokeProcedures` analyzer rule runs the
  * bound procedure ONCE at analysis and plans its result rows — the
  * side effect (a commit, a sweep) happens exactly once per statement,
  * the table-format driver pattern (all data movement inside the
  * called API face is distributed; only metrics cross the driver). */
object GraftProcedures {

  /** The one name registry both [[GraftCatalog.listProcedures]] and
    * [[load]]'s dispatch (and its unknown-name message) derive from —
    * a verb added in one place cannot silently vanish from the other. */
  val Names: Seq[String] =
    Seq("optimize", "compact", "vacuum", "rollback", "analyze")

  /** Procedure lookup for [[GraftCatalog.loadProcedure]]. */
  def load(catalog: GraftCatalog, name: String): UnboundProcedure = {
    val spark = SparkSession.active
    def root(args: InternalRow): String = {
      // a NULL table argument refuses by name, never NPEs
      require(!args.isNullAt(0),
        s"CALL ${catalog.name()}.$name: table must not be NULL")
      val tbl = args.getUTF8String(0).toString
      val r = catalog.tableRootByName(tbl)
      require(Snapshots.currentGen(spark, r).nonEmpty,
        s"CALL ${catalog.name()}.$name: table '$tbl' does not exist " +
          s"under the ${catalog.name()} warehouse")
      r
    }
    name.toLowerCase(java.util.Locale.ROOT) match {
      case "optimize" => proc("optimize",
        "bin-packed small-file compaction: rewrites ONLY files under " +
          "small_bytes into ~target_bytes outputs, carries the rest by " +
          "reference — IO proportional to small-file bytes, never table " +
          "bytes",
        params = Seq(
          required("table", StringType),
          withDefault("small_bytes", LongType, (8L << 20).toString),
          withDefault("target_bytes", LongType, (64L << 20).toString)),
        resultCols = Seq("packed" -> IntegerType, "carried" -> IntegerType,
          "generation" -> LongType)) { args =>
        val r = root(args)
        val (packed, carried) = MergeTable.optimize(spark, r,
          smallBytes = args.getLong(1), targetBytes = args.getLong(2))
        InternalRow(packed, carried,
          Snapshots.currentGen(spark, r).getOrElse(-1L))
      }
      case "compact" => proc("compact",
        "whole-table rewrite into n_files key-range files (cluster_by " +
          "=> 'dim' re-clusters by the (key, dim) z-order interleave " +
          "instead); folds every deletion vector away (compact IS the " +
          "DV purge). OCC-staged since round 18: runs CONCURRENTLY " +
          "with live optimistic writers — concurrent disjoint ingest " +
          "rebases manifest-only, a writer touching a consumed file " +
          "replays the rewrite. Alias chains are KEPT (chain-shedding " +
          "needs the quiescent Scala compact — a concurrent writer's " +
          "carried files bind the prior physical names)",
        params = Seq(
          required("table", StringType),
          withDefault("n_files", IntegerType, "8"),
          withDefault("cluster_by", StringType, "NULL")),
        resultCols = Seq("rewritten" -> IntegerType,
          "generation" -> LongType)) { args =>
        val r = root(args)
        val n =
          if (args.isNullAt(2)) MergeTable.compactOcc(spark, r,
            nFiles = args.getInt(1))
          else MergeTable.compactZOrderOcc(spark, r,
            args.getUTF8String(2).toString, nFiles = args.getInt(1))
        InternalRow(n, Snapshots.currentGen(spark, r).getOrElse(-1L))
      }
      case "vacuum" => proc("vacuum",
        "retire generations past the newest `retain` predecessors — " +
          "and/or, with older_than_ms, past an AGE window (the " +
          "reference's 1-day lifecycle semantics: every generation " +
          "committed inside the window is kept, plus the boundary " +
          "generation so as-of stays answerable across the whole " +
          "window) — and GC data files no retained manifest references " +
          "(crash orphans included); set orphan_age_ms above the " +
          "longest prepare-to-commit window to run concurrently with " +
          "optimistic writers (their staged-but-uncommitted files are " +
          "younger than that, so the GC never collects an in-flight " +
          "prepare); time travel to a swept generation then refuses " +
          "loudly, naming what is retained",
        params = Seq(
          required("table", StringType),
          withDefault("retain", IntegerType, "1"),
          withDefault("older_than_ms", LongType, "-1"),
          withDefault("orphan_age_ms", LongType, "0")),
        resultCols = Seq("removed_files" -> IntegerType)) { args =>
        val r = root(args)
        InternalRow(MergeTable.sweep(spark, r,
          retainPredecessors = args.getInt(1),
          minOrphanAgeMillis = args.getLong(3),
          olderThanMillis = args.getLong(2)))
      }
      case "rollback" => proc("rollback",
        "restore the STATE of a committed generation as a NEW commit " +
          "(history is never rewritten); idempotence fences carry so a " +
          "rollback cannot re-admit already-applied stream batches. " +
          "OCC-committed since round 18: if ANY commit lands while the " +
          "restore is staged, the statement refuses loudly instead of " +
          "silently erasing the concurrent commit — re-examine the new " +
          "history and re-run if the restore is still wanted",
        params = Seq(
          required("table", StringType),
          required("generation", LongType)),
        resultCols = Seq("generation" -> LongType)) { args =>
        val r = root(args)
        InternalRow(MergeTable.rollbackToOcc(spark, r, args.getLong(1)))
      }
      case "analyze" => proc("analyze",
        "backfill rows/bytes on legacy manifest entries (metadata-only " +
          "commit) so mergeAuto/deleteWhere pricing is honest on tables " +
          "that predate those statistics",
        params = Seq(required("table", StringType)),
        resultCols = Seq("backfilled" -> IntegerType)) { args =>
        InternalRow(MergeTable.analyzeManifest(spark, root(args)))
      }
      case other => throw new IllegalArgumentException(
        s"CALL ${catalog.name()}.$other: unknown procedure — available: " +
          Names.mkString(", "))
    }
  }

  private def required(n: String, t: DataType): ProcedureParameter =
    ProcedureParameter.in(n, t).build()

  private def withDefault(n: String, t: DataType,
      sql: String): ProcedureParameter =
    ProcedureParameter.in(n, t).defaultValue(sql).build()

  /** True while the current analysis was requested by SQL `EXPLAIN` —
    * Spark's `InvokeProcedures` runs the bound procedure AT ANALYSIS
    * (verified against the 4.1 bytecode: `BoundProcedure.call` and
    * `LocalScan.rows` are both invoked inside the rule), so without
    * this guard `EXPLAIN CALL lake.vacuum(...)` would perform the
    * sweep. `ExplainCommand.run` is on the stack for exactly that
    * path and for nothing that should execute the verb; a plan
    * request must never commit. (The Dataset.explain() route cannot
    * reach here "unexecuted": `spark.sql("CALL ...")` analyzes — and
    * therefore runs — the verb at Dataset creation, before any
    * .explain() is called on the handle.) */
  private val ExplainCommandClass =
    "org.apache.spark.sql.execution.command.ExplainCommand"

  // fail-FAST guard on the stack-scan's version fragility (r17 ADVICE):
  // if a Spark upgrade renames/relocates ExplainCommand, the scan below
  // would silently stop matching and EXPLAIN CALL would EXECUTE the
  // destructive verb. Asserting the class exists at first procedure
  // load turns that silent regression into a loud startup error.
  require(
    try { Class.forName(ExplainCommandClass, false,
      classOf[SparkSession].getClassLoader); true }
    catch { case _: ClassNotFoundException => false },
    s"$ExplainCommandClass not found on this Spark version — the " +
      "EXPLAIN CALL side-effect guard (underExplain) keys on it; " +
      "re-point the guard before any CALL procedure may run")

  private def underExplain(): Boolean =
    Thread.currentThread().getStackTrace.exists(
      _.getClassName == ExplainCommandClass)

  /** One bound procedure: Spark's analyzer fills defaults/named args
    * into `call`'s InternalRow in declaration order; the body runs the
    * API face and returns its metrics as a one-row LocalScan. Under
    * `EXPLAIN CALL` the body is NOT run — the scan carries a
    * placeholder row (every metric -1) so the plan renders and nothing
    * commits (spec-pinned in GraftProceduresSpec). */
  private def proc(procName: String, doc: String,
      params: Seq[ProcedureParameter],
      resultCols: Seq[(String, DataType)])(
      body: InternalRow => InternalRow): UnboundProcedure =
    new UnboundProcedure with BoundProcedure {
      override def name(): String = procName
      override def description(): String = doc
      override def bind(inputType: StructType): BoundProcedure = this
      override def parameters(): Array[ProcedureParameter] = params.toArray
      // a maintenance verb commits — never re-runnable as a pure expr
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val schema = StructType(resultCols.map { case (n, t) =>
          org.apache.spark.sql.types.StructField(n, t, nullable = false) })
        val row =
          if (underExplain())
            InternalRow(resultCols.map {
              case (_, IntegerType) => -1
              case (_, LongType) => -1L
              case (_, t) => throw new IllegalStateException(
                s"unplaceholderable EXPLAIN metric type $t")
            }: _*)
          else body(input)
        java.util.Collections.singletonList[Scan](new LocalScan {
          override def rows(): Array[InternalRow] = Array(row)
          override def readSchema(): StructType = schema
          override def description(): String = s"graft $procName result"
        }).iterator()
      }
    }

  /** Helper so string results (if any future verb needs one) encode
    * correctly. */
  private[plans] def utf8(s: String): UTF8String = UTF8String.fromString(s)
}
