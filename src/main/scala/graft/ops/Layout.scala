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

  /** Write a frame bucketed+sorted by `key` as a managed table. */
  def writeBucketed(df: DataFrame, key: String, buckets: Int,
      table: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Join two tables previously bucketed on the same key with the same
    * bucket count: plans as a sort-merge join with NO Exchange on either
    * side (asserted in LayoutSpec). */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))

  /** Write events partitioned by calendar day (directory per day). */
  def writePartitionedByDay(events: DataFrame, dir: String,
      tsCol: String = "ts"): Unit =
    events.withColumn("day", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("day").parquet(dir)

  /** Read one day back — prunes to a single partition directory. */
  def readDay(spark: SparkSession, dir: String, day: String): DataFrame =
    spark.read.parquet(dir).filter(col("day") === day)
}
