package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword token count of one word against a
  * fixed vocabulary — the encode step of x_subword_tokenize, as a
  * codegen'd Catalyst expression (the [[TokenWindowHash]] /
  * [[NearestCentroid]] pattern: model state rides the expression as an
  * opaque reference object in the task binary, proven across real
  * process boundaries by the round-12 local-cluster gate).
  *
  * Semantics (must stay bit-identical to the DuckDB oracle replay):
  * from position p, take the LONGEST vocab token of length ≤ maxLen
  * that matches `word` at p and advance by its length; if none
  * matches, advance one character (the unknown-character fallback).
  * Either way exactly one token is counted per step, so single-char
  * vocab membership never changes the count — the oracle's recursive
  * CTE encodes the same `ELSE advance 1` arm.
  *
  * Inputs are lowercased `[A-Za-z]+` runs (the corpus word model), so
  * byte = character and `String.substring` here agrees with SQL
  * `substr` positions exactly. */
case class SubwordCount(child: Expression, vocab: Array[String],
    maxLen: Int) extends UnaryExpression {

  require(maxLen >= 2, "maxLen must be at least 2")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "subword_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.sql}")

  // built once per JVM from the (serializable) vocab array; the codegen
  // path ships the set itself through the plan's reference array
  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.length * 2)
    vocab.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    SubwordCount.count(input.asInstanceOf[UTF8String], set, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("subwordVocab", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SubwordCount.count($c, $setRef, $maxLen)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SubwordCount {

  /** Static so generated code calls it directly. One pass; at most
    * maxLen set probes per emitted token. */
  def count(word: UTF8String, set: java.util.HashSet[String],
      maxLen: Int): Long = {
    val w = word.toString
    val n = w.length
    var pos = 0
    var toks = 0L
    while (pos < n) {
      var advance = 1
      var l = math.min(maxLen, n - pos)
      while (l >= 2 && advance == 1) {
        if (set.contains(w.substring(pos, pos + l))) advance = l
        l -= 1
      }
      toks += 1
      pos += advance
    }
    toks
  }

  /** Column API: token count of `word` under `vocab` by greedy
    * longest-match. */
  def subwordCount(word: Column, vocab: Array[String], maxLen: Int): Column =
    ColumnBridge.column(SubwordCount(ColumnBridge.expression(word), vocab, maxLen))
}
