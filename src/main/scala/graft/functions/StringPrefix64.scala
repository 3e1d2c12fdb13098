package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ORDER-PRESERVING 64-bit embedding of a string: its first 8 UTF-8
  * bytes, big-endian, as an unsigned number mapped into signed-Long
  * order (sign bit flipped). This is Iceberg's `truncate[N]` manifest
  * statistic expressed as an integer: for any strings a, b
  *
  *   a <= b  (Spark's UTF8String binary order)  ⇒  prefix64(a) <= prefix64(b)
  *
  * so a per-file [min, max] over the embedding is a CORRECT (coarser)
  * file-skipping range for every string predicate — equality and bands
  * prune files whose 8-byte-prefix window provably excludes the probe,
  * with false KEEPS only (prefix collisions), never false skips. The
  * embedding rides the existing integral `#cstat` manifest machinery
  * unchanged: one code path stores, carries, intersects and
  * bloom-probes both numeric and string statistics.
  *
  * Why monotone: UTF-8 preserves code-point order byte-wise, unsigned
  * byte comparison IS UTF8String's binary comparison, shorter strings
  * zero-pad (and 0x00 is the smallest byte, so a prefix sorts before
  * its extensions — exactly the string order). Codegen'd, null-safe.
  *
  * Reference grounding: the reference's status/priority-typed columns
  * are all strings (every CSV column lands as varchar,
  * `/root/reference/source/load_data_to_rds_lambda/handler.py:34`) —
  * without a string statistic, no predicate on them can ever skip a
  * file. */
case class StringPrefix64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  // AbstractDataType is private[sql], so the type contract lives in
  // checkInputDataTypes rather than an ExpectsInputTypes mixin
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"string_prefix64 takes a string, got ${child.dataType.simpleString}")
  override def prettyName: String = "string_prefix64"

  override def nullSafeEval(s: Any): Any =
    StringPrefix64.embed(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.StringPrefix64.embed($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StringPrefix64 {

  /** First 8 UTF-8 bytes, big-endian unsigned, sign-flipped into signed
    * Long order. Static so generated code calls it directly. */
  def embed(s: UTF8String): Long = {
    val b = s.getBytes
    var v = 0L
    var i = 0
    while (i < 8) {
      v = (v << 8) | (if (i < b.length) b(i) & 0xffL else 0L)
      i += 1
    }
    v ^ Long.MinValue
  }

  /** Driver-side twin over a Java string — what the PLANNER uses to
    * embed predicate literals before intersecting manifest ranges. The
    * two must agree bit-for-bit (spec-pinned). */
  def embed(s: String): Long =
    embed(UTF8String.fromString(s))

  /** Column API. */
  def stringPrefix64(c: Column): Column =
    ColumnBridge.column(StringPrefix64(ColumnBridge.expression(c)))
}
