package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.{ColumnBridge, LongLongInputTypes}
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit Morton (Z-order) interleave of two 32-bit dimensions — the
  * multi-dimensional CLUSTERING key behind `s_zorder_pruned`'s layout
  * (the technique Delta OPTIMIZE ZORDER BY / Iceberg sort orders use,
  * from Morton 1966 via the UB-tree line of work).
  *
  * Why a layout primitive and not a query primitive: parquet prunes row
  * groups on per-column min/max. A table sorted linearly by `a` answers
  * `a BETWEEN ..` scans with near-perfect skipping but scans EVERYTHING
  * for `b BETWEEN ..`; sorting by interleaved bits gives every prefix
  * of the sort key alternating bits of BOTH dimensions, so row groups
  * become ~square tiles in (a, b) space and min/max stats prune for
  * predicates on EITHER or BOTH dimensions. At 100 TB this is the
  * difference between "one clustered copy serves the (user, time) query
  * family" and "one sorted copy per predicate column".
  *
  * Contract: both inputs must already be mapped MONOTONICALLY into
  * [0, 2^32) by the caller (ids used raw, timestamps as epoch seconds —
  * see `Layout.zorderValue`); out-of-range values fail loudly rather
  * than silently folding distant points onto nearby tiles. Codegen'd
  * (static call, no virtual dispatch), null-safe.
  */
case class ZOrder64(left: Expression, right: Expression)
    extends BinaryExpression with LongLongInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder64"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder64.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrder64.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrder64 {

  /** Spread the low 32 bits of `v` into the even bit positions of a
    * 64-bit word (the classic mask-shift cascade). */
  private def spread(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code: bit i of `a` → bit 2i, bit i of `b` → bit 2i+1.
    * Static so generated code calls it directly. */
  def interleave(a: Long, b: Long): Long = {
    if ((a & 0xffffffff00000000L) != 0 || (b & 0xffffffff00000000L) != 0 ||
      a < 0 || b < 0)
      throw new IllegalArgumentException(
        s"zorder64 dimensions must be in [0, 2^32): got ($a, $b) — " +
          "map each dimension monotonically into u32 first")
    spread(a) | (spread(b) << 1)
  }

  /** Column API. */
  def zorder64(a: Column, b: Column): Column =
    ColumnBridge.column(ZOrder64(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
