package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic cross-engine numeric helpers.
  *
  * Why these exist: Spark's `round(double, 2)` / `cast(double as decimal)`
  * round via the shortest decimal string of the double (java.math.BigDecimal
  * HALF_UP), while DuckDB rounds the scaled binary double. For true values
  * whose decimal expansion terminates in a half (e.g. 95.095 =
  * 100.10 × 0.95), the two engines disagree by one cent. Money products
  * (price × rate) hit that boundary constantly.
  *
  * The fix is to express money rounding as pure IEEE-754 arithmetic —
  * `floor(x·100 + 0.5) / 100` — which every engine evaluates bit-identically
  * on the same input doubles. Sums then run over exact integer cents, which
  * are associative and partition-order-independent (the 100 TB concern:
  * a double sum's value must not depend on shuffle arrival order).
  *
  * Limitation (documented, accepted): `round2`/`cents` are half-UP toward
  * +∞, which differs from half-away-from-zero for negative halves; all
  * monetary inputs in this schema are non-negative.
  */
object DetMath {

  /** Round to 2 decimals, bit-deterministic across engines. */
  def round2(c: Column): Column = floor(c * lit(100.0) + lit(0.5)) / lit(100.0)

  /** Exact integer cents of a money value (BIGINT). */
  def cents(c: Column): Column =
    floor(c * lit(100.0) + lit(0.5)).cast(LongType)

  /** Exact, order-independent money sum: sum integer cents, divide once.
    * Returns DOUBLE (cents fit in a Long up to ~9.2e16 = $92 trillion;
    * at 100 TB-scale row counts, sum in DECIMAL instead — see sumMoney). */
  def sumMoneyCents(c: Column): Column =
    (sum(cents(c)).cast(DoubleType) / lit(100.0))

  /** Exact money sum via DECIMAL(18,2) — unbounded-ish precision
    * (sum promotes to DECIMAL(28,2)); the ultra-scale path when cent
    * totals could exceed Long range (> $92 trillion). */
  def sumMoneyDecimal(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact money sum for 2-decimal-grid inputs via integer cents — the
    * default: long-sum aggregation codegens tighter than decimal-sum and
    * is equally exact/associative on this grid. Same value as
    * [[sumMoneyDecimal]] bit-for-bit after the final divide. */
  def sumMoney(c: Column): Column = sumMoneyCents(c)

  /** SQL text of [[sumMoney]] for oracle queries. */
  def sumMoneySql(expr: String): String = sumMoneyCentsSql(expr)

  /** The SQL text of round2 for oracle queries. */
  def round2Sql(expr: String): String = s"floor(($expr) * 100.0 + 0.5) / 100.0"

  /** The SQL text of sumMoneyCents for oracle queries. */
  def sumMoneyCentsSql(expr: String): String =
    s"CAST(sum(CAST(floor(($expr) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0"
}
