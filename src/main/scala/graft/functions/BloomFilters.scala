package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter build/probe on Spark's own codegen'd expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind Catalyst's runtime-filter injection, reached through the
  * bridge the way the Column/registry shims are).
  *
  * Why this exists as a first-class operator: a broadcast hash relation
  * costs tens of bytes per key (hashed relation overhead on top of the
  * 8-byte key), a Bloom filter costs ~`1.44·log2(1/fpp)` BITS per key —
  * ~10 bits at 1% fpp, a 30-80× reduction. At 100 TB that is the
  * difference between "the reference set broadcasts" and "it does not":
  * a 10⁹-entry eval-suite shingle set is a ~1.2 GB filter (one
  * broadcast, feasible) vs a ≥40 GB hashed relation (not). The filter
  * admits false POSITIVES only, so callers keep exactness by verifying
  * survivors against the exact set — which by then is a join whose
  * probe side has already shrunk to (true hits + fpp·candidates).
  */
object BloomFilters {

  /** Optimal bit count for `n` items at false-positive rate `fpp`
    * (the standard m = −n·ln p ∕ ln²2 formula). */
  def optimalNumBits(n: Long, fpp: Double): Long = {
    require(n > 0, s"item count must be positive, got $n")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
  }

  /** Aggregate a LongType column into a serialized Bloom filter. The
    * build is fully distributed (partial filters OR-merge); only the
    * finished ~n·10-bit sketch returns to the driver.
    *
    * `BloomFilterAggregate`'s analysis-time check caps item/bit counts
    * at `spark.sql.optimizer.runtime.bloomFilter.maxNumItems`/`maxNumBits`
    * (defaults 4M items / 64M bits — sized for Catalyst's AUTOMATIC
    * runtime-filter injection, where an over-large filter is an
    * optimizer misfire). Here the caller asked for the filter
    * explicitly, so the caps are raised to the requested size for the
    * duration of the build and restored after (the save/restore pattern
    * `Layout.writeZOrdered` uses for the parquet timestamp conf). */
  def buildBloom(df: DataFrame, column: String, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val numBits = optimalNumBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(df.col(column)),
      Literal(expectedItems),
      Literal(numBits)).toAggregateExpression()
    val conf = df.sparkSession.conf
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val savedItems = conf.getOption(itemsKey)
    val savedBits = conf.getOption(bitsKey)
    try {
      conf.set(itemsKey, math.max(expectedItems, 4000000L).toString)
      conf.set(bitsKey, math.max(numBits, 67108864L).toString)
      val bytes = df.select(ColumnBridge.column(agg)).head.get(0)
      require(bytes != null, s"bloom build over empty/all-null '$column'")
      bytes.asInstanceOf[Array[Byte]]
    } finally {
      savedItems.fold(conf.unset(itemsKey))(conf.set(itemsKey, _))
      savedBits.fold(conf.unset(bitsKey))(conf.set(bitsKey, _))
    }
  }

  /** Per-GROUP Bloom filters in one distributed pass: one serialized
    * filter per value of `groupCol` (all sized for `expectedItems`, the
    * max group cardinality). The grouped form of [[buildBloom]] — used
    * for per-FILE filters in the lake table's bloom registry, where the
    * group is `_metadata.file_path`'s basename. Same cap save/restore. */
  def perGroupBlooms(df: DataFrame, groupCol: String, valueCol: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val numBits = optimalNumBits(math.max(expectedItems, 1L), fpp)
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(df.col(valueCol)),
      Literal(math.max(expectedItems, 1L)),
      Literal(numBits)).toAggregateExpression()
    val conf = df.sparkSession.conf
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val savedItems = conf.getOption(itemsKey)
    val savedBits = conf.getOption(bitsKey)
    try {
      conf.set(itemsKey, math.max(expectedItems, 4000000L).toString)
      conf.set(bitsKey, math.max(numBits, 67108864L).toString)
      df.groupBy(df.col(groupCol))
        .agg(ColumnBridge.column(agg).as("bloom"))
    } finally {
      savedItems.fold(conf.unset(itemsKey))(conf.set(itemsKey, _))
      savedBits.fold(conf.unset(bitsKey))(conf.set(bitsKey, _))
    }
  }

  /** Driver-side membership probe of a serialized filter — the
    * metadata-plane twin of [[mightContain]] (a query planner holding
    * per-file filters probes them locally, no job). */
  def mightContainLong(bloom: Array[Byte], value: Long): Boolean =
    org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(bloom))
      .mightContainLong(value)

  /** Membership probe of a LongType column against a serialized filter
    * — codegen'd, usable anywhere a Column is (including inside
    * higher-order-function lambdas, which is what lets a caller prune
    * an ARRAY of candidates before exploding it). */
  def mightContain(bloom: Array[Byte], value: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), ColumnBridge.expression(value)))
}
