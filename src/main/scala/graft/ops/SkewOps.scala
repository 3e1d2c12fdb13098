package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities — the hand-rolled complement to AQE's
  * skew-join splitting for the cases AQE can't fix (e.g. a single hot key
  * in a shuffled hash join against a mid-sized build side, or
  * deterministic pre-salting of a known-skewed aggregation).
  *
  * At 100 TB the classic failure is one partition holding a hot key's
  * entire fan-in. Salting trades one shuffle for bounded partition sizes:
  * the probe side spreads each key over `factor` sub-keys, the build side
  * replicates each row `factor` times. Both transforms are deterministic
  * (hash-based salt, no RNG) so results are reproducible and retries
  * safe — the same discipline as everywhere else in this engine.
  */
object SkewOps {

  /** Deterministic salt in [0, factor): spreads a skewed probe row by
    * hashing the WHOLE row tuple (salting by the key alone would keep a
    * hot key on one partition — the thing we're fixing). */
  def salt(factor: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(factor.toLong)).cast("int")

  /** Equi-join `large ⋈ small` on `key`, salted `factor` ways:
    * large side gets a per-row salt, small side is replicated once per
    * salt value, the join key becomes (key, salt). Semantically identical
    * to `large.join(small, key)`; physically the hot key's rows land on
    * `factor` partitions instead of one. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      factor: Int = 8): DataFrame = {
    require(factor > 0)
    // NOT spread (r19): widening the single-split probe scan was
    // MEASURED as a wash-to-loss (0.92-1.30 s vs 0.88-0.95 s warm, one
    // more AQE stage job) — the per-row salt hash is too light to beat
    // the exchange, the r18 light-query Spread lesson again
    val salted = large.withColumn("__salt",
      salt(factor, large.columns.map(col).toIndexedSeq: _*))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Hot-key ISOLATION join — the fact⋈fact skew mitigation (classic
    * MapReduce "skewed join" / pre-AQE Spark folklore): [[saltedJoin]]
    * replicates the ENTIRE build side `factor`×, which is right when
    * that side is a dimension but catastrophic when it is itself a fact
    * (measured in RelScaleBench: a 32×-replicated orders side planned
    * as a 5.2 GB broadcast). Isolation splits by key temperature
    * instead: the declared hot keys' build rows — a HANDFUL of rows, a
    * hot key is hot because of its PROBE fan-in — broadcast to meet the
    * probe side map-side with no shuffle of the hot rows at all; every
    * other key rides the normal shuffle join untouched. Semantically
    * invisible (the two branches partition the key space; spec-pinned
    * equal to the plain join); the hot branch's cost is a broadcast of
    * |hotKeys| rows, the cold branch's skew is gone by construction.
    * At 100 TB the hot-key list comes from the warehouse's frequency
    * statistics (x_heavy_hitters is exactly that query). */
  def isolatedSkewJoin(large: DataFrame, small: DataFrame, key: String,
      hotKeys: Seq[Long]): DataFrame = {
    require(hotKeys.nonEmpty, "no hot keys declared — use a plain join")
    val hotL = large.filter(col(key).isin(hotKeys: _*))
    val coldL = large.filter(!col(key).isin(hotKeys: _*))
    val hotS = small.filter(col(key).isin(hotKeys: _*))
    val coldS = small.filter(!col(key).isin(hotKeys: _*))
    hotL.join(broadcast(hotS), Seq(key)).unionByName(coldL.join(coldS, Seq(key)))
  }

  /** Hot-key detection from frequency STATISTICS — the missing producer
    * for [[isolatedSkewJoin]]'s hot-key list (at 100 TB nobody
    * hand-declares hot keys; the warehouse's frequency sketch does).
    * Runs the same distributed Misra-Gries pass as x_heavy_hitters over
    * the join-key column: each partition ships ≤ k+1 (key, count) rows
    * regardless of table size, the merge is order-free, and the result
    * is a driver-sized (≤ k-row) list — no full GROUP BY of a 100 TB
    * fact's key column.
    *
    * Detection contract: with k ≥ 4/frac counters the total MG
    * undercount is ≤ 2n/(k+1) < frac·n/2, so keeping merged estimates
    * > frac·n/2 GUARANTEES every key with true frequency ≥ frac·n is
    * returned; any extra keys returned have true frequency > frac·n/2
    * (mildly warm — harmless to isolate, their build rows broadcast a
    * few extra rows). Spec-pinned on a zipf fixture in SkewAndSqlSpec. */
  def hotKeysFromStats(df: DataFrame, key: String, frac: Double = 0.01,
      kOverride: Int = 0): Seq[Long] = {
    require(frac > 0 && frac <= 1, s"frac must be in (0,1], got $frac")
    val k = if (kOverride > 0) kOverride
            else math.max(16, math.ceil(4.0 / frac).toInt)
    val spark = df.sparkSession
    import spark.implicits._
    // one pass: MG summary per partition plus a sentinel row carrying
    // the partition's row count (flag column — no key value is reserved).
    // NULL join keys are dropped before the Long decode: they can never
    // be hot keys of an inner join (they match nothing), and a null
    // would otherwise fail the non-nullable decoder with an opaque NPE.
    val parts = df.select(col(key).cast("long"))
      .filter(col(key).isNotNull).as[Long]
      .mapPartitions { it =>
        var n = 0L
        val counted = it.map { t => n += 1; t }
        val s = graft.functions.HeavyHitters.mgSummary(counted, k)
        (s.iterator.map { case (kk, c) => (kk, c, false) } ++
          Iterator.single((0L, n, true)))
      }.toDF("k", "cnt", "is_n")
      // LAZY (r19): the single collect below materializes the partials
      .localCheckpoint(false, graft.ops.Pin.Level)
    val nDf = parts.filter(col("is_n")).agg(sum(col("cnt")).as("n"))
    val summed = parts.filter(!col("is_n"))
      .groupBy(col("k")).agg(sum(col("cnt")).as("c"))
    val thr = summed.orderBy(col("c").desc, col("k"))
      .limit(k + 1).agg(
        when(count(lit(1)) > k, min(col("c"))).otherwise(lit(0L)).as("thr"))
    summed.crossJoin(broadcast(thr)).crossJoin(broadcast(nDf))
      .select(col("k"), (col("c") - col("thr")).as("est"), col("n"))
      .filter(col("est") > col("n") * frac / 2)
      .orderBy(col("est").desc, col("k"))
      .collect().map(_.getLong(0)).toSeq // ≤ k rows by construction
  }

  /** [[isolatedSkewJoin]] with the hot-key list DETECTED from the probe
    * side's own frequency statistics ([[hotKeysFromStats]]); falls back
    * to the plain join when nothing crosses the hotness threshold. */
  def isolatedSkewJoinAuto(large: DataFrame, small: DataFrame, key: String,
      frac: Double = 0.01): DataFrame = {
    val hot = hotKeysFromStats(large, key, frac)
    if (hot.isEmpty) large.join(small, Seq(key))
    else isolatedSkewJoin(large, small, key, hot)
  }

  /** j_salted_skew — the salted join as a declared, oracled query:
    * revenue per brand via lineitem ⋈ part, salted 8 ways. The oracle is
    * the PLAIN join's SQL — salting must be semantically invisible
    * (hash-exact), only the physical key distribution changes. */
  def saltedJoinQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
    val part = graft.Tables.part(spark, dir)
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    saltedJoin(li, part, "l_partkey")
      .groupBy(col("p_brand"))
      .agg(
        graft.functions.DetMath.sumMoneyCents(
          col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("p_brand"))
  }

  /** g_two_phase_count — the salted aggregation as a declared, oracled
    * query: per-returnflag counts; oracle is the plain GROUP BY count. */
  def twoPhaseCountQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    twoPhaseCount(graft.Tables.lineitem(spark, dir), "l_returnflag")
      .orderBy(col("l_returnflag"))

  /** Two-phase (salted) aggregation: count/sum per key with a bounded
    * per-partition group size even under extreme key skew. Spark's
    * partial aggregation already map-side combines; this adds an explicit
    * intermediate (key, salt) reduction for aggregates whose partial
    * state is large (e.g. collect_set). */
  def twoPhaseCount(df: DataFrame, key: String, factor: Int = 8): DataFrame =
    df.withColumn("__salt", salt(factor, df.columns.map(col).toIndexedSeq: _*))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("cnt"))
}
