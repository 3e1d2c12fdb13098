package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit hashes of every `window`-TOKEN window of a text — the
  * codegen'd engine under x_substring_dedup's grouping key.
  *
  * The higher-order-function formulation (explode(shingles(text, w)) +
  * xxhash64) materializes every w-token window as a STRING (≈w× the
  * corpus bytes through the explode) and runs the shingle lambda
  * interpreted — HOFs are not whole-stage codegen'd. This expression
  * produces the hashes directly in one O(n) pass over the UTF-8 bytes:
  * FNV-1a per token (split on the 0x20 byte — never part of a
  * multi-byte UTF-8 sequence, so byte-level splitting is exact), then a
  * polynomial rolling combine over the token hashes (base P, natural
  * 2^64 wrap, the [[RollingFingerprint]] update). No window string ever
  * exists.
  *
  * Downstream grouping by these hashes equals grouping by the window
  * strings up to 64-bit collisions (~positions²/2^65 — the repo's
  * standard vocabulary-hash trade; a collision merges two windows'
  * document frequencies). Token semantics match `split(text, " ", -1)`:
  * consecutive spaces delimit empty tokens, the empty text is one empty
  * token; texts under `window` tokens yield an empty array (the
  * shingles convention). */
case class TokenWindowHash(child: Expression, window: Int)
    extends UnaryExpression {

  require(window > 0, "window must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "token_window_hash"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      TokenWindowHash.windowHashes(input.asInstanceOf[UTF8String].getBytes, window))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TokenWindowHash.windowHashes($c.getBytes(), $window))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenWindowHash {
  final val FnvBasis: Long = 0xcbf29ce484222325L
  final val FnvPrime: Long = 0x100000001b3L

  /** Static so generated code calls it directly (no virtual dispatch —
    * the [[RollingFingerprint]] pattern). */
  def windowHashes(bytes: Array[Byte], w: Int): Array[Long] = {
    val n = bytes.length
    var nTokens = 1
    var i = 0
    while (i < n) { if (bytes(i) == ' ') nTokens += 1; i += 1 }
    if (nTokens < w) return Array.emptyLongArray
    // FNV-1a hash per token, one byte pass
    val th = new Array[Long](nTokens)
    var t = 0
    var h = FnvBasis
    i = 0
    while (i < n) {
      val b = bytes(i)
      if (b == ' ') { th(t) = h; t += 1; h = FnvBasis }
      else h = (h ^ (b & 0xffL)) * FnvPrime
      i += 1
    }
    th(t) = h
    // polynomial rolling combine over token hashes
    val P = RollingFingerprint.P
    var pw = 1L
    i = 1
    while (i < w) { pw *= P; i += 1 }
    val out = new Array[Long](nTokens - w + 1)
    var acc = 0L
    i = 0
    while (i < w) { acc = acc * P + th(i); i += 1 }
    out(0) = acc
    i = w
    while (i < nTokens) {
      acc = (acc - th(i - w) * pw) * P + th(i)
      out(i - w + 1) = acc
      i += 1
    }
    out
  }

  /** Column API. */
  def tokenWindowHashes(c: Column, window: Int): Column =
    ColumnBridge.column(TokenWindowHash(ColumnBridge.expression(c), window))
}
