package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Group F — filters & predicates (SURVEY §2.B group F).
  *
  * Grounding:
  *  - event-type IN-set filter (keep INSERT/MODIFY, drop REMOVE):
  *    `/root/reference/source/write_dynamodb_stream_to_s3_lambda/handler.py:27-31`
  *  - compound selection-rule predicates (DMS table_mappings LIKE rules):
  *    `/root/reference/cdk_infrastructure/__init__.py:186-202`
  *
  * Both compile to plain Catalyst `Filter` nodes that push down to the
  * parquet scan (visible as `PushedFilters` in `.explain("formatted")`) —
  * the Spark-native form of the reference's source-side selection pushdown
  * (SURVEY §4).
  */
object Filters {

  /** The reference's accepted change-event set (INSERT|MODIFY analog). */
  val KeptEventTypes: Seq[String] = Seq("signup", "purchase")

  /** f_event_type_in — `WHERE event_type IN (…)` over the events stream
    * table (A7). */
  def eventTypeIn(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type").isin(KeptEventTypes: _*))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))

  /** Strict variant of A7: unknown event types are a hard error
    * (`write_dynamodb_stream_to_s3_lambda/handler.py:33-37`). Distributed
    * fail-fast: raise_error inside a when-otherwise, so the check runs
    * codegen'd on executors, no driver collect. */
  def eventTypeInStrict(df: DataFrame, known: Seq[String]): DataFrame =
    df.filter(
      when(col("event_type").isin(known: _*), lit(true))
        .otherwise(raise_error(concat(
          lit("unexpected event_type: "), col("event_type")))))

  /** f_compound_pred — conjunctive/disjunctive predicate with LIKE, range
    * and null checks (DMS selection-rule shape, A17). */
  def compoundPred(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(
        (col("o_orderpriority").like("1-%") || col("o_orderpriority").like("2-%")) &&
        col("o_totalprice").between(1000.0, 200000.0) &&
        col("o_orderstatus").isNotNull &&
        col("o_orderstatus") =!= "P")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"))
}
