package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables

/** As-of (point-in-time) join — the lookup a CDC warehouse exists to
  * answer: "what was the latest state of this key at time t?". The
  * reference's warehouse holds trade/transaction streams keyed by time
  * (`/root/reference/source/load_data_to_dynamodb_lambda/trades.json`,
  * `txns.csv` running balances); joining any event to the most recent
  * prior state row is the canonical query over such data. Spark has no
  * built-in ASOF JOIN (DuckDB/Pandas do) — this is the composed-operator
  * implementation, (a) on the preference ladder.
  *
  * Algorithm (scale-first): tag and UNION the two inputs, ONE shuffle on
  * the key, then a per-key ordered window where `last(payload,
  * ignoreNulls)` carries the newest right-side payload forward into each
  * left row. Compared to the naive range join (`l.ts >= r.ts` then
  * argmax per left row) this is linear per key instead of quadratic, and
  * it inherits none of BroadcastNestedLoopJoin's blowup — the same union
  * + running-window shape Flink/kdb-style asof implementations use. At
  * equal timestamps the right row sorts FIRST (side 0 < 1), giving the
  * inclusive `leftTs >= rightTs` semantics DuckDB's ASOF JOIN has.
  *
  * Determinism: if several right rows share (key, ts) the carried payload
  * is the last in an unspecified order — callers wanting a total order
  * should dedup the right side first (our events fixture has unique
  * (user_id, ts), verified).
  */
object AsofJoin {

  /** Generic as-of join: every left row gains an `asof` struct holding
    * `payloads` from the newest right row with `rightTs <= leftTs` and
    * the same `key` (null struct when no such row exists). Left rows and
    * columns pass through unchanged. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payloads: Seq[String],
      asofCol: String = "asof"): DataFrame = {
    val rPrep = right.select(
      col(key).as("__key"), col(rightTs).as("__ts"),
      struct(payloads.map(col): _*).as("__payload"))
    val lPrep = left.select(
      col(key).as("__key"), col(leftTs).as("__ts"),
      lit(null).cast(rPrep.schema("__payload").dataType).as("__payload"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__row"))
      .withColumn("__side", lit(1))
    val rUnion = rPrep
      .withColumn("__row", lit(null).cast(lPrep.schema("__row").dataType))
      .withColumn("__side", lit(0))
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lPrep.unionByName(rUnion)
      .withColumn(asofCol, last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__row.*"), col(asofCol))
  }

  /** j_asof — every event joined to the user's most recent purchase at or
    * before it (the "state as of the event" lookup). DuckDB-oracled via
    * its native ASOF LEFT JOIN. Timestamps are compared and differenced
    * at MICROsecond precision on both engines (the oracle's parquet
    * reader truncates TIMESTAMP(NANOS) to micros, so micro-precision is
    * the shared exact domain). */
  def lastPurchaseAsof(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("us", expr("ts_ns div 1000"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"),
        col("us").as("p_us"), col("value").as("p_value"))
    asofJoin(
      e.select(col("event_id"), col("user_id"), col("value"), col("us")),
      purchases,
      key = "user_id", leftTs = "us", rightTs = "us",
      payloads = Seq("p_us", "p_value"))
      .select(
        col("event_id"), col("user_id"), col("value"),
        col("asof.p_value").as("last_purchase_value"),
        (col("us") - col("asof.p_us")).cast(LongType)
          .as("us_since_purchase"))
      .orderBy(col("event_id"))
  }
}
