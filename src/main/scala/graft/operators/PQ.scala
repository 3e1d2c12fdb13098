package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Product quantization (Jégou et al. 2011, "Product quantization for
  * nearest neighbor search"): split the embedding space into `m`
  * dimension subspaces, k-means each subspace independently, and store
  * every vector as its m nearest-subcentroid codes — 64-dim float32
  * (256 bytes) becomes m = 8 small ints (8 bytes, 32×). Approximate
  * scoring never touches the original vectors: an asymmetric distance
  * computation (ADC) precomputes the query's dot product against every
  * subcentroid (m × ksub values — index-header-sized) and scores a
  * vector as the sum of m table lookups.
  *
  * At 100 TB this is the storage answer for embedding search: the code
  * table is 32× smaller than the vectors, scans of it are
  * correspondingly cheaper, and the ADC score is m adds per row — the
  * standard recall/compression trade next to the exact ([[Similarity
  * .knnCosine]]) and partition-pruned ([[Similarity.annKnnCosineIndexed]],
  * ivf) paths.
  *
  * Determinism: each subspace trains with the SAME micro-unit-quantized
  * Lloyd protocol as IVF ([[Similarity.lloydTrain]]), so codebooks are
  * bit-identical across runs and engines, codes are argmin with the
  * first-minimum tie-break, and the ADC score is a fixed-order
  * (s = 0..m-1) double sum — all of it DuckDB-replayable, which is what
  * lets both PQ queries carry full oracles.
  */
object PQ {

  val DefaultM = 8
  val DefaultKsub = 16
  val Dim = 64

  /** Train the m per-subspace codebooks: codebooks(s)(k) is the k-th
    * centroid of subspace s (dsub doubles each). */
  def train(spark: SparkSession, dir: String, m: Int = DefaultM,
      ksub: Int = DefaultKsub, iters: Int = 2): Array[Array[Array[Double]]] = {
    val dsub = Dim / m
    val emb = Tables.embeddings(spark, dir)
    Array.tabulate(m) { s =>
      Similarity.lloydTrain(spark,
        emb.select(col("vec_id"),
          slice(col("embedding"), s * dsub + 1, dsub).as("embedding")),
        ksub, iters)
    }
  }

  /** x_pq_encode — encode every vector as its m subspace codes, one
    * output row per (vec_id, subspace): the PQ code table a compressed
    * index stores instead of the vectors. Served from the MATERIALIZED
    * code table ([[ensurePqIndex]] — training runs once per corpus
    * snapshot behind the freshness gate, the x_ivf_indexed stance), so
    * the query is a posexplode over an 8-byte column scan; the first
    * call on a fresh corpus pays the build like every other
    * materialized index. Assignment at build time is one codegen'd
    * nearest_centroid per dimension slice — m narrow map passes, no
    * shuffle before the output sort. */
  def encode(spark: SparkSession, dir: String, m: Int = DefaultM,
      ksub: Int = DefaultKsub, iters: Int = 2): DataFrame = {
    val (path, _) = ensurePqIndex(spark, dir, m, ksub, iters)
    spark.read.parquet(path)
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("s", "code")))
      .orderBy(col("vec_id"), col("s"))
  }

  private def codesCol(m: Int, codebooks: Array[Array[Array[Double]]]) = {
    val dsub = Dim / m
    array((0 until m).map { s =>
      graft.functions.NearestCentroid.assign(
        slice(col("embedding"), s * dsub + 1, dsub), codebooks(s))
    }: _*)
  }

  /** Materialize the PQ code table: (vec_id, label, codes[m]) — 8
    * bytes of codes standing in for 256 bytes of vector — plus the
    * codebooks beside it (m × ksub × dsub doubles, the index header;
    * Double.toString round-trips exactly, the IVF-centroid argument).
    * Freshness-gated on the source signature + build params, like
    * every other materialized index. */
  /** One directory PER parameterization — different (m, ksub) are
    * different indexes; a shared path would ping-pong full rebuilds
    * through the sig gate whenever two callers alternate (the
    * ivfIndexPath lesson). */
  def pqIndexPath(dir: String, m: Int = DefaultM,
      ksub: Int = DefaultKsub): String =
    graft.ops.Layout.indexPath(s"pq_m${m}_k$ksub", dir)

  def ensurePqIndex(spark: SparkSession, dir: String, m: Int = DefaultM,
      ksub: Int = DefaultKsub,
      iters: Int = 2): (String, Array[Array[Array[Double]]]) = {
    val path = pqIndexPath(dir, m, ksub)
    val bookFile = new java.io.File(path, "_GRAFT_PQ_CODEBOOKS")
    val sig = s"${graft.ops.Layout.dataSig(s"$dir/embeddings.parquet")}_m${m}_k${ksub}_i${iters}_q32"
    graft.ops.Layout.ensureSigGated(path, sig) {
      val codebooks = train(spark, dir, m, ksub, iters)
      Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("label").cast(LongType).as("label"),
          codesCol(m, codebooks).as("codes"))
        .write.mode("overwrite").parquet(path)
      val lines = for {
        s <- codebooks.indices; k <- codebooks(s).indices
      } yield s"$s;$k;${codebooks(s)(k).mkString(",")}"
      java.nio.file.Files.write(bookFile.toPath,
        lines.mkString("\n").getBytes)
    }
    import scala.jdk.CollectionConverters._
    val parsed = java.nio.file.Files.readAllLines(bookFile.toPath).asScala
      .map { l =>
        val Array(s, k, vs) = l.split(";", 3)
        (s.toInt, k.toInt, vs.split(',').map(_.toDouble))
      }
    val mm = parsed.map(_._1).max + 1
    val kk = parsed.map(_._2).max + 1
    val books = Array.ofDim[Array[Double]](mm, kk)
    parsed.foreach { case (s, k, v) => books(s)(k) = v }
    (path, books.map(_.toArray))
  }

  /** ADC score column over a `codes` array column: the fixed-order
    * (s = 0..m-1) sum of the query's precomputed per-subspace dots,
    * looked up by each row's stored code — m adds per row, never the
    * vectors. `dt(s)(k)` = dot(q_s, c_{s,k}) computed on the DRIVER.
    * A code outside [0, ksub) means a corrupt code table; under
    * non-ANSI element_at it would become NULL and silently sink the row
    * to the bottom of the ranking, so the lookup fails loudly instead
    * (the NearestCentroid badDim/badNull stance). */
  private def adcScore(dt: Array[Array[Double]]): org.apache.spark.sql.Column =
    dt.indices.map { s =>
      val code = element_at(col("codes"), s + 1)
      val ksub = dt(s).length
      when(code.isNull || code < 0 || code >= ksub,
        raise_error(concat(lit(s"pq adc: subspace $s code out of [0, $ksub): "),
          coalesce(code.cast(StringType), lit("null")))).cast(DoubleType))
        .otherwise(element_at(array(dt(s).map(lit): _*), code + lit(1)))
    }.reduce(_ + _)

  private def adcTable(qvec: Seq[Float], codebooks: Array[Array[Array[Double]]],
      dsub: Int): Array[Array[Double]] =
    Array.tabulate(codebooks.length) { s =>
      Array.tabulate(codebooks(s).length) { kk =>
        val c = codebooks(s)(kk)
        (0 until dsub).foldLeft(0.0)((acc, i) =>
          acc + qvec(s * dsub + i).toDouble * c(i))
      }
    }

  /** x_pq_knn — approximate top-k by ADC over the MATERIALIZED code
    * table: the query's per-subspace dot-product table is computed on
    * the DRIVER (m × ksub × dsub flops — index metadata, like IVF probe
    * ranking), and each stored vector scores as the fixed-order sum of
    * its m table lookups — m adds per row over an 8-byte code column,
    * never the vectors. The plan is one narrow projection over the code
    * scan + TakeOrderedAndProject: no shuffle, no per-row vector math
    * at all. */
  def pqTopK(spark: SparkSession, dir: String, queryId: Long = 0L,
      k: Int = 20, m: Int = DefaultM, ksub: Int = DefaultKsub,
      iters: Int = 2): DataFrame = {
    val dsub = Dim / m
    val (path, codebooks) = ensurePqIndex(spark, dir, m, ksub, iters)
    val qvec = Tables.embeddings(spark, dir)
      .filter(col("vec_id") === queryId)
      .select(col("embedding")).head().getSeq[Float](0)
    // ADC table: dt(s)(k) = dot(q_s, c_{s,k}), left-to-right like every
    // other dot in the engine; fixed s = 0..m-1 summation order — the
    // oracle replays it as an explicit d0 + d1 + … chain
    val dt = adcTable(qvec, codebooks, dsub)
    spark.read.parquet(path)
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("label"), adcScore(dt).as("adc_score"))
      .orderBy(col("adc_score").desc, col("vec_id"))
      .limit(k)
  }

  /** The IVF-PQ composite (Jégou et al. 2011 §V; the layout FAISS calls
    * IndexIVFPQ): PQ codes stored PER INVERTED LIST — written
    * partitioned by `cid`, so a query's nprobe probe set prunes the
    * code scan via PartitionFilters and query time does NO join at all.
    * This is the billion-scale ANN shape: the scan is over 8-byte codes
    * (32× smaller than vectors) AND restricted to nprobe/nlist of the
    * corpus — the two reductions compose.
    *
    * RESIDUAL encoding (round 10, the canonical IndexIVFPQ layout): the
    * PQ quantizer trains on and encodes x − centroid(cid), not the raw
    * vectors. Within one inverted list the residuals span a far smaller
    * dynamic range than the vectors themselves (the coarse quantizer
    * already explains the list's location), so the same m × ksub code
    * budget buys strictly finer quantization — recall at fixed bytes is
    * the whole point, measured against the raw composite in
    * AnnScaleBench. The query side scores candidates by ADC L2 distance
    * in RESIDUAL space: per probed list c, the table
    * dt_c(s)(k) = ‖(q − centroid(c))_s − codeword_{s,k}‖² is computed
    * on the driver (nprobe × m × ksub × dsub flops — index-header
    * arithmetic), and a row in list c scores as the fixed-order sum of
    * its m lookups in ITS list's table — still m adds per row, never
    * the vectors. Candidates rank by ascending distance; the exact
    * cosine refine is unchanged.
    *
    * Freshness is keyed on the source signature plus both quantizers'
    * params; the IVF centroids are reused from their own gated build,
    * so the indexes can never disagree about the corpus snapshot. The
    * residual codebooks train inside THIS gate (they are a function of
    * the coarse assignment, so they belong to the composite, not to the
    * standalone PQ index). */
  /** Parameter-keyed like [[pqIndexPath]]: the composite of two
    * quantizers is a different index for every (nlist, m, ksub). */
  def ivfpqIndexPath(dir: String, nlist: Int = 16, m: Int = DefaultM,
      ksub: Int = DefaultKsub): String =
    graft.ops.Layout.indexPath(s"ivfpqr_l${nlist}_m${m}_k$ksub", dir)

  /** The coarse centroids as an nlist-row broadcastable frame
    * (cid, cvec) — how a per-row residual picks up ITS list's centroid
    * without literal blow-up or a shuffle. */
  private[graft] def centroidFrame(spark: SparkSession,
      cents: Array[Array[Double]]): DataFrame = {
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("cid", IntegerType, nullable = false),
      StructField("cvec", ArrayType(DoubleType, containsNull = false),
        nullable = false)))
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
    cents.zipWithIndex.foreach { case (c, i) => rows.add(Row(i, c.toSeq)) }
    spark.createDataFrame(rows, schema)
  }

  /** Adds `res` = embedding − centroid(cid), Float→Double promoted per
    * element — the per-row residual under a frame's existing coarse
    * assignment. One broadcast join on cid, one codegen'd zip_with. */
  private[graft] def withResidual(spark: SparkSession, assigned: DataFrame,
      cents: Array[Array[Double]]): DataFrame =
    assigned.join(broadcast(centroidFrame(spark, cents)), Seq("cid"))
      .withColumn("res", zip_with(col("embedding"), col("cvec"),
        (x, c) => x.cast(DoubleType) - c))
      .drop("cvec")

  /** The m residual codes of a frame carrying `res`, under frozen
    * residual codebooks — shared by the batch build and the incremental
    * appender ([[graft.streaming.IncrementalIvfPq]]), so the two are
    * code-identical by construction. */
  private[graft] def residualCodesCol(m: Int,
      books: Array[Array[Array[Double]]]): org.apache.spark.sql.Column = {
    val dsub = Dim / m
    array((0 until m).map { s =>
      graft.functions.NearestCentroid.assign(
        slice(col("res"), s * dsub + 1, dsub), books(s))
    }: _*)
  }

  def ensureIvfPqIndex(spark: SparkSession, dir: String, nlist: Int = 16,
      m: Int = DefaultM, ksub: Int = DefaultKsub, iters: Int = 2)
      : (String, Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val (ivfPath, cents) = Similarity.ensureIvfIndex(spark, dir, nlist, iters)
    val path = ivfpqIndexPath(dir, nlist, m, ksub)
    val bookFile = new java.io.File(path, "_GRAFT_IVFPQ_RESBOOKS")
    val sig = s"${graft.ops.Layout.dataSig(s"$dir/embeddings.parquet")}" +
      s"_res_l${nlist}_m${m}_k${ksub}_i${iters}_q32"
    graft.ops.Layout.ensureSigGated(path, sig) {
      val dsub = Dim / m
      // the residual frame feeds m Lloyd chains (each: seed scan +
      // iters assignment/mean passes) AND the final encode — checkpoint
      // it once instead of re-running the parquet scan + zip_with per pass
      val res = withResidual(spark, spark.read.parquet(ivfPath), cents)
        .select(col("vec_id"), col("cid"),
          col("label").cast(LongType).as("label"), col("res"))
        .localCheckpoint(true, graft.ops.Pin.Level)
      val books = Array.tabulate(m) { s =>
        Similarity.lloydTrain(spark,
          res.select(col("vec_id"),
            slice(col("res"), s * dsub + 1, dsub).as("embedding")),
          ksub, iters)
      }
      res.select(col("vec_id"), col("cid"), col("label"),
          residualCodesCol(m, books).as("codes"))
        .write.mode("overwrite").partitionBy("cid").parquet(path)
      val lines = for {
        s <- books.indices; k <- books(s).indices
      } yield s"$s;$k;${books(s)(k).mkString(",")}"
      java.nio.file.Files.write(bookFile.toPath,
        lines.mkString("\n").getBytes)
    }
    import scala.jdk.CollectionConverters._
    val parsed = java.nio.file.Files.readAllLines(bookFile.toPath).asScala
      .map { l =>
        val Array(s, k, vs) = l.split(";", 3)
        (s.toInt, k.toInt, vs.split(',').map(_.toDouble))
      }
    val mm = parsed.map(_._1).max + 1
    val kk = parsed.map(_._2).max + 1
    val books = Array.ofDim[Array[Double]](mm, kk)
    parsed.foreach { case (s, k, v) => books(s)(k) = v }
    (path, cents, books.map(_.toArray))
  }

  /** The RAW-vector composite — the pre-round-10 layout, retained as
    * the recall-comparison anchor for the residual one (AnnScaleBench
    * measures recall@k of both at fixed m; residual wins — that gap is
    * the reason the canonical layout encodes residuals). */
  private[graft] def ivfpqRawIndexPath(dir: String, nlist: Int = 16,
      m: Int = DefaultM, ksub: Int = DefaultKsub): String =
    graft.ops.Layout.indexPath(s"ivfpq_l${nlist}_m${m}_k$ksub", dir)

  private[graft] def ensureIvfPqRawIndex(spark: SparkSession, dir: String,
      nlist: Int = 16, m: Int = DefaultM, ksub: Int = DefaultKsub,
      iters: Int = 2)
      : (String, Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val (ivfPath, cents) = Similarity.ensureIvfIndex(spark, dir, nlist, iters)
    val (pqPath, books) = ensurePqIndex(spark, dir, m, ksub, iters)
    val path = ivfpqRawIndexPath(dir, nlist, m, ksub)
    val sig = s"${graft.ops.Layout.dataSig(s"$dir/embeddings.parquet")}" +
      s"_l${nlist}_m${m}_k${ksub}_i${iters}_q32"
    graft.ops.Layout.ensureSigGated(path, sig) {
      spark.read.parquet(ivfPath).select(col("vec_id"), col("cid"))
        .join(spark.read.parquet(pqPath), Seq("vec_id"))
        .write.mode("overwrite").partitionBy("cid").parquet(path)
    }
    (path, cents, books)
  }

  /** The ADC candidate cut — the stage whose scan must open only the
    * probed cid partitions (PartitionFilters, spec-asserted). */
  private[graft] def ivfpqCandidates(spark: SparkSession, path: String,
      probes: Seq[Long], dt: Array[Array[Double]], queryId: Long,
      refine: Int): DataFrame =
    ivfpqCandidatesFrom(spark.read.parquet(path), probes, dt, queryId, refine)

  private[graft] def ivfpqCandidatesFrom(codes: DataFrame, probes: Seq[Long],
      dt: Array[Array[Double]], queryId: Long, refine: Int): DataFrame =
    codes
      .filter(col("cid").isin(probes: _*) && col("vec_id") =!= queryId)
      .select(col("vec_id"), adcScore(dt).as("adc_score"))
      .orderBy(col("adc_score").desc, col("vec_id"))
      .limit(refine)

  /** Per-probe residual ADC distance tables:
    * dt_c(s)(k) = ‖(q − centroid(c))_s − codeword_{s,k}‖², each inner
    * sum a left-to-right double fold of squared diffs (the one float
    * protocol every face and the DuckDB oracle share). */
  private def adcResidualTables(qvec: Seq[Float],
      cents: Array[Array[Double]], books: Array[Array[Array[Double]]],
      probes: Seq[Long], dsub: Int): Map[Long, Array[Array[Double]]] =
    probes.map { p =>
      val cent = cents(p.toInt)
      val qr = Array.tabulate(qvec.length)(i => qvec(i).toDouble - cent(i))
      p -> Array.tabulate(books.length) { s =>
        Array.tabulate(books(s).length) { kk =>
          val c = books(s)(kk)
          (0 until dsub).foldLeft(0.0) { (acc, i) =>
            val d = qr(s * dsub + i) - c(i); acc + d * d
          }
        }
      }
    }.toMap

  /** The residual ADC candidate cut: each row scores through ITS list's
    * per-probe table (a cid dispatch over the nprobe tables — nprobe
    * branches of m guarded lookups, all literals), ascending distance,
    * ties to the smaller vec_id. The scan must open only the probed cid
    * partitions (PartitionFilters, spec-asserted). */
  private[graft] def ivfpqResidualCandidatesFrom(codes: DataFrame,
      probes: Seq[Long], dts: Map[Long, Array[Array[Double]]],
      queryId: Long, refine: Int): DataFrame = {
    val dist = probes.tail.foldLeft(
        when(col("cid") === probes.head, adcScore(dts(probes.head)))) {
      (acc, p) => acc.when(col("cid") === p, adcScore(dts(p)))
    }.otherwise(raise_error(
      // unreachable under the isin filter below — fail-loud anyway (the
      // adcScore corrupt-code stance) rather than a silent NULL sink
      concat(lit("ivfpq residual: cid outside probed lists: "),
        col("cid").cast(StringType))).cast(DoubleType))
    codes
      .filter(col("cid").isin(probes: _*) && col("vec_id") =!= queryId)
      .select(col("vec_id"), dist.as("adc_dist"))
      .orderBy(col("adc_dist"), col("vec_id"))
      .limit(refine)
  }

  /** Serve residual IVF-PQ top-k over ANY (vec_id, cid, codes) relation
    * under the given quantizers — shared by the batch-built index
    * ([[ivfpqTopK]]) and the incrementally-appended one
    * ([[graft.streaming.IncrementalIvfPq.topK]]), which are row-equal
    * by the frozen-quantizer argument and therefore serve IDENTICAL
    * results through this one path (spec-pinned). */
  def ivfpqServe(spark: SparkSession, codes: DataFrame, dir: String,
      cents: Array[Array[Double]], books: Array[Array[Array[Double]]],
      queryId: Long = 0L, k: Int = 20, nprobe: Int = 4,
      refine: Int = 50): DataFrame = {
    val m = books.length
    val dsub = Dim / m
    val qvec = Tables.embeddings(spark, dir)
      .filter(col("vec_id") === queryId)
      .select(col("embedding")).head().getSeq[Float](0)
    // probe ranking on the driver — THE shared protocol
    // ([[Similarity.probeRanking]]: -dot, stable sort, cid tie-break)
    val probes = Similarity.probeRanking(qvec, cents, nprobe)
    val dts = adcResidualTables(qvec, cents, books, probes, dsub)
    val candidateIds: Array[Long] =
      ivfpqResidualCandidatesFrom(codes, probes, dts, queryId, refine)
        .collect().map(_.getLong(0))
    refineExact(spark, dir, qvec, candidateIds, k)
  }

  /** Exact refine: the `refine` winners are an id LOOKUP, not a join —
    * collecting them to the driver (≤ refine longs, index-header-sized
    * like the probe ranking) turns the fetch into a pushed IN filter,
    * so parquet row-group min/max statistics skip everything else; the
    * broadcast-join alternative scanned the FULL vector table to hash
    * 50 ids (measured 3.5 s vs 0.56 s plain-IVF at 1 M vectors). The
    * cosine is the serveIvf convention exactly (same literal array,
    * same codegen'd dot) — scores bit-identical to x_ivf_knn's. */
  private def refineExact(spark: SparkSession, dir: String,
      qvec: Seq[Float], candidateIds: Array[Long], k: Int): DataFrame = {
    val qcol = array(qvec.map(lit): _*)
    Tables.embeddings(spark, dir)
      .filter(col("vec_id").isin(candidateIds: _*))
      .select(col("vec_id"), col("label").cast(LongType).as("label"),
        graft.functions.VectorFunctions.cosine(col("embedding"), qcol)
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** x_ivfpq_batch — Q queries against the residual IVF-PQ composite in
    * ONE pass: the serving matrix completed (x_ivf_batch is batch ×
    * IVF; this is batch × the 32×-narrower composite — the shape a
    * production vector-serving tier actually runs, because at corpus
    * scale the per-query win of scanning 8-byte codes compounds across
    * the batch).
    *
    * Everything per-query that the single-query face computes on the
    * driver becomes DATA here:
    *  - probe ranking: the shared distributed protocol
    *    ([[Similarity.probeRankingDf]]) above the small-Q cutoff;
    *  - the per-(query, probe) residual ADC tables: a (qid, cid, dts)
    *    frame built by joining the probe pairs to the broadcast
    *    centroid/codebook literals — Q×nprobe rows of m×ksub doubles,
    *    joined to the code scan — broadcast at serving Q, a cid-keyed
    *    shuffle-hash join above [[Similarity.BatchBroadcastMax]] (the
    *    frame grows linearly with Q; the keyed face has no broadcast
    *    cliff) — the distributed twin of `adcResidualTables`, same
    *    left-to-right double arithmetic, so distances are bit-identical
    *    — spec-pinned;
    *  - the scan: probed cid partitions only (PartitionFilters), each
    *    code row scoped to the queries probing its list by the
    *    broadcast join, ADC = m guarded array lookups per (row, query);
    *  - per-query top-`refine` window, then the exact-cosine re-rank
    *    (pushed-IN id lookup at interactive Q — Q·refine ids; a keyed
    *    join above the cutoff, where a pushed literal list would
    *    outgrow the plan).
    * The index is scanned once for ALL queries and never shuffled; only
    * (qid, candidate) scores shuffle, partitioned by qid. Per-query
    * results are row-identical to [[ivfpqTopK]] (spec-pinned). */
  def ivfpqBatch(spark: SparkSession, dir: String,
      queryIds: Seq[Long] = Seq(0L, 1L, 2L, 3L), k: Int = 10,
      nlist: Int = 16, nprobe: Int = 4, m: Int = DefaultM,
      ksub: Int = DefaultKsub, iters: Int = 2, refine: Int = 50,
      driverRankMax: Int = Similarity.BatchDriverRankMax,
      broadcastMax: Int = Similarity.BatchBroadcastMax): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val (path, cents, books) = ensureIvfPqIndex(spark, dir, nlist, m, ksub, iters)
    val dsub = Dim / m
    val wanted = queryIds.distinct
    // pushed-IN fetch at interactive Q; broadcast-joined id frame above
    // the cutoff, where a 10⁵-literal IN would bloat the plan itself
    val qDf = (if (wanted.size <= broadcastMax)
        Tables.embeddings(spark, dir)
          .filter(col("vec_id").isin(wanted: _*))
      else
        Tables.embeddings(spark, dir)
          .join(broadcast(wanted.toDF("vec_id")), Seq("vec_id")))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      // LAZY (r19): the driver-regime collect right below (or the
      // count/probe build above the cutoff) is the materializing
      // action — the eager form paid a dedicated checkpoint job first
      .localCheckpoint(false, graft.ops.Pin.Level)
    // Driver regime (Q ≤ driverRankMax): ONE collect of the checkpointed
    // query vectors serves the existence check, the probe ranking AND
    // the ADC tables — r18: the former shape materialized a driver-built
    // probe relation only to collect it straight back, spending four
    // metadata-sized jobs per call on Q=4 (the ivfKnnBatch pattern).
    val qsSmall: Option[Array[(Long, Seq[Float])]] =
      if (wanted.size <= driverRankMax)
        Some(qDf.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)))
      else None
    qsSmall match {
      case Some(qs) => require(qs.length == wanted.size,
        s"ivfpqBatch: some of $wanted missing from $dir/embeddings.parquet")
      case None => require(qDf.count() == wanted.size,
        s"ivfpqBatch: some of $wanted missing from $dir/embeddings.parquet")
    }
    // ranked probes — the one shared protocol, driver or distributed by Q
    val probesByQidSmall: Option[Seq[(Long, Seq[Long])]] = qsSmall.map(qs =>
      qs.toSeq.map { case (qid, qv) =>
        qid -> Similarity.probeRanking(qv, cents, nprobe)
      })
    // the distributed probe relation exists only above the cutoff
    val prDf = probesByQidSmall match {
      case Some(_) => null
      case None => Similarity.probeRankingDf(spark, qDf, cents, nprobe)
        .localCheckpoint(true, graft.ops.Pin.Level)
    }
    val allProbes: Seq[Long] = probesByQidSmall match {
      case Some(ps) => ps.flatMap(_._2).distinct
      case None => prDf.select(col("cid")).distinct().as[Long].collect().toSeq
    }

    // per-(query, probe) residual ADC tables as DATA: rvec = qvec − c,
    // then d(s, code) = ‖rvec slice − codeword‖², assembled (s asc,
    // code asc) into the nested lookup array. Below the small-Q cutoff
    // the tables are computed on the driver (Q×nprobe×m×ksub doubles —
    // index-header arithmetic, the probe-ranking pattern) and shipped
    // as a local relation; above it the SAME arithmetic runs as a
    // dataframe over the broadcast codebook literals. Both faces use
    // identical element order and double ops (adcResidualTables's
    // left-to-right fold), so they are bit-equal — spec-pinned.
    val adcDf =
      if (probesByQidSmall.isDefined) {
        val qvecs = qsSmall.get.toMap
        probesByQidSmall.get.flatMap { case (qid, probes) =>
          val dts = adcResidualTables(qvecs(qid), cents, books, probes, dsub)
          probes.map(p => (qid, p, dts(p).map(_.toSeq).toSeq))
        }.toDF("qid", "cid", "dts")
      } else {
        val centsDf = cents.indices.map(c => (c.toLong, cents(c))).toDF("cid", "cvec")
        val booksDf = (for { s <- books.indices; kk <- books(s).indices }
          yield (s, kk, books(s)(kk))).toDF("s", "code", "cw")
        prDf
          .join(broadcast(qDf), Seq("qid"))
          .join(broadcast(centsDf), Seq("cid"))
          .withColumn("rvec", zip_with(
            transform(col("qvec"), x => x.cast(DoubleType)), col("cvec"),
            (a, b) => a - b))
          .crossJoin(broadcast(booksDf))
          .select(col("qid"), col("cid"), col("s"), col("code"),
            aggregate(
              zip_with(slice(col("rvec"), col("s") * dsub + 1, lit(dsub)),
                col("cw"), (a, b) => (a - b) * (a - b)),
              lit(0.0), (acc, x) => acc + x).as("d"))
          .groupBy(col("qid"), col("cid"))
          .agg(sort_array(collect_list(struct(col("s"), col("code"), col("d"))))
            .as("flat")) // complete (s, code) grid ⇒ index s·ksub+code
          .select(col("qid"), col("cid"),
            transform(sequence(lit(0), lit(m - 1)), si =>
              transform(sequence(lit(0), lit(ksub - 1)), ci =>
                element_at(col("flat"), si * ksub + ci + 1).getField("d")))
              .as("dts"))
      }

    // one pruned scan of the code table, scoped per (row, probing query)
    val code = (s: Int) => element_at(col("codes"), s + 1)
    val adcDist = (0 until m).map { s =>
      when(code(s).isNull || code(s) < 0 || code(s) >= ksub,
        raise_error(concat(lit(s"ivfpq batch: subspace $s code out of [0, $ksub): "),
          coalesce(code(s).cast(StringType), lit("null")))).cast(DoubleType))
        .otherwise(element_at(element_at(col("dts"), s + 1), code(s) + 1))
    }.reduce(_ + _)
    // the ADC frame is Q×nprobe rows of m×ksub doubles (~1 KB/row at
    // defaults) — linear in Q, so above [[Similarity.BatchBroadcastMax]]
    // it stops riding broadcast (≈400 MB at Q=10⁵ would bottleneck on
    // the driver and every executor's memory) and becomes a cid-keyed
    // shuffle-hash join: the 8-byte-code scan shuffles by cid once —
    // linear, executor-distributed — and the ADC tables build the hash
    // side (Q×nprobe/nlist rows per key). Same keys, same arithmetic,
    // row-identical results (spec-pinned); only the physical join moves.
    val bcast = wanted.size <= broadcastMax
    val cands = spark.read.parquet(path)
      .filter(col("cid").isin(allProbes: _*)) // PartitionFilters
      .join(if (bcast) broadcast(adcDf) else adcDf.hint("shuffle_hash"),
        Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), adcDist.as("adc_dist"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("adc_dist"), col("vec_id"))))
      .filter(col("rn") <= refine)
      .select(col("qid"), col("vec_id"))

    // exact-cosine refine (the serveIvf arithmetic, so scores are
    // bit-identical to the single-query face's)
    val refined =
      if (wanted.size <= driverRankMax) {
        // materialize the Q×refine candidate frame ONCE (r19): the ids
        // collect and the broadcast join below both consume it — the
        // un-checkpointed form re-ran the whole ADC scan + window
        // pipeline a second time to build the broadcast side. Bounded:
        // ≤ driverRankMax × refine (qid, vec_id) pairs by construction.
        val candsCk = cands.localCheckpoint(false, graft.ops.Pin.Level)
        val ids = candsCk.select(col("vec_id")).distinct().as[Long].collect()
        Tables.embeddings(spark, dir)
          .filter(col("vec_id").isin(ids.toIndexedSeq: _*)) // pushed IN
          .join(broadcast(candsCk), Seq("vec_id"))
      } else
        Tables.embeddings(spark, dir).join(cands, Seq("vec_id"))
    refined
      .join(if (bcast) broadcast(qDf) else qDf, Seq("qid"))
      .select(col("qid"), col("vec_id"),
        col("label").cast(LongType).as("label"),
        graft.functions.VectorFunctions.cosine(col("embedding"), col("qvec"))
          .as("cos_sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("cos_sim").desc, col("vec_id"))))
      .filter(col("rk") <= k).drop("rk")
      .orderBy(col("qid"), col("cos_sim").desc, col("vec_id"))
  }

  /** The raw-vector composite's serve — retained for the AnnScaleBench
    * recall comparison only ([[ensureIvfPqRawIndex]]). */
  private[graft] def ivfpqServeRaw(spark: SparkSession, codes: DataFrame,
      dir: String, cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]], queryId: Long = 0L, k: Int = 20,
      nprobe: Int = 4, refine: Int = 50): DataFrame = {
    val dsub = Dim / books.length
    val qvec = Tables.embeddings(spark, dir)
      .filter(col("vec_id") === queryId)
      .select(col("embedding")).head().getSeq[Float](0)
    val probes = Similarity.probeRanking(qvec, cents, nprobe)
    val dt = adcTable(qvec, books, dsub)
    val candidateIds: Array[Long] =
      ivfpqCandidatesFrom(codes, probes, dt, queryId, refine)
        .collect().map(_.getLong(0))
    refineExact(spark, dir, qvec, candidateIds, k)
  }

  private[graft] def ivfpqTopKRaw(spark: SparkSession, dir: String,
      queryId: Long = 0L, k: Int = 20, nlist: Int = 16, nprobe: Int = 4,
      m: Int = DefaultM, ksub: Int = DefaultKsub, iters: Int = 2,
      refine: Int = 50): DataFrame = {
    val (path, cents, books) =
      ensureIvfPqRawIndex(spark, dir, nlist, m, ksub, iters)
    ivfpqServeRaw(spark, spark.read.parquet(path), dir, cents, books,
      queryId, k, nprobe, refine)
  }

  /** x_ivfpq_knn — residual IVF-PQ top-k with exact refine: rank the
    * IVF centroids against the query on the DRIVER (k×dim flops — index
    * metadata), ADC-score ONLY the nprobe probed lists' codes in
    * residual space (PartitionFilters prune the rest of the corpus;
    * per-probe distance tables are driver-computed index-header
    * arithmetic), keep the `refine` nearest candidates by ADC distance,
    * then re-rank those few against their TRUE vectors (exact cosine —
    * the candidate id set is a pushed IN filter on one embeddings
    * scan). Output shape matches x_ivf_knn (vec_id, label, cos_sim), so
    * the quality ladder brute → IVF → IVF-PQ is directly comparable.
    *
    * Every stage is deterministic (quantized training of BOTH
    * quantizers — the residual codebooks train on micro-unit-quantized
    * sums of exact double residuals — first-minimum codes, fixed-order
    * ADC sums, ties to the smaller vec_id), which is what lets the
    * whole pipeline — coarse training, residual training, encoding,
    * serving — carry a full DuckDB oracle. */
  def ivfpqTopK(spark: SparkSession, dir: String, queryId: Long = 0L,
      k: Int = 20, nlist: Int = 16, nprobe: Int = 4, m: Int = DefaultM,
      ksub: Int = DefaultKsub, iters: Int = 2, refine: Int = 50): DataFrame = {
    val (path, cents, books) = ensureIvfPqIndex(spark, dir, nlist, m, ksub, iters)
    ivfpqServe(spark, spark.read.parquet(path), dir, cents, books,
      queryId, k, nprobe, refine)
  }
}
