package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing-style rolling-hash document fingerprint (driver mandate:
  * "document fingerprinting (rolling hash)").
  *
  * Computes a polynomial rolling hash (base P, natural 2^64 wrap) over
  * every `window`-byte window of the UTF-8 text and returns the MINIMUM
  * window hash. Unlike a whole-document hash, the min-window fingerprint
  * is stable under content shifts (prepending a header leaves most
  * windows — usually including the minimum — intact), which is what makes
  * it useful for near-dup bucketing of crawled text.
  *
  * O(n) per document via the rolling update
  * `h' = (h - b_out·P^(w-1))·P + b_in`; whole-stage codegen'd. Texts
  * shorter than the window hash their full length.
  */
case class RollingFingerprint(child: Expression, window: Int)
    extends UnaryExpression {

  require(window > 0, "window must be positive")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_fingerprint"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    RollingFingerprint.minWindowHash(bytes, window)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingFingerprint.minWindowHash($c.getBytes(), $window)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFingerprint {
  /** Polynomial base (odd, large — good 2^64 mixing). */
  final val P: Long = 1099511628211L // FNV-64 prime

  /** Static so generated code can call it directly (stays inside the
    * WholeStageCodegen stage — no lambda/virtual dispatch). */
  def minWindowHash(bytes: Array[Byte], window: Int): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val w = math.min(window, n)
    // P^(w-1) with wrap
    var pw = 1L
    var i = 1
    while (i < w) { pw *= P; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * P + (bytes(i) & 0xffL); i += 1 }
    var min = h
    i = w
    while (i < n) {
      h = (h - (bytes(i - w) & 0xffL) * pw) * P + (bytes(i) & 0xffL)
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Column API. */
  def rollingFingerprint(c: Column, window: Int = 32): Column =
    ColumnBridge.column(RollingFingerprint(ColumnBridge.expression(c), window))
}
