package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.{ColumnBridge, LongLongInputTypes}
import org.apache.spark.sql.types.{DataType, LongType}

/** Order-16 Hilbert curve index of two 16-bit dimensions — the second
  * space-filling clustering key next to [[ZOrder64]] (`s_hilbert_pruned`
  * vs `s_zorder_pruned`).
  *
  * Why carry BOTH curves: parquet prunes row groups on min/max, so a
  * clustered layout's scan cost for a box query is the number of
  * CONTIGUOUS curve ranges the box intersects — every range break is
  * another row group whose stats straddle the box. The Z curve breaks
  * locality at every power-of-two seam (the (0b0111…, y) → (0b1000…, y)
  * jump crosses half the key space); the Hilbert curve is continuous —
  * consecutive indices are always grid neighbors (Hilbert 1891, via the
  * Faloutsos/Roseman 1989 analysis of curve clustering for databases) —
  * so a box decomposes into measurably fewer runs (HilbertSpec counts
  * them head-to-head). At 100 TB fewer runs = fewer row groups touched
  * per query box, at identical write cost: the interleave is swapped,
  * the sort/partition machinery is shared. The trade: Z is cheaper to
  * compute and its prefixes are plain bit masks (easier for external
  * tooling); Hilbert wins when the read amplification of seam-crossing
  * boxes dominates — which is the 100 TB regime.
  *
  * Contract (like [[ZOrder64]], one order down): both inputs must be
  * mapped monotonically into [0, 2^16) by the caller — `Layout.norm16`
  * already produces exactly this — and out-of-range values fail loudly.
  * Output is in [0, 2^32). Order 16 keeps the per-step `s²·((3·rx)^ry)`
  * accumulation safely inside a signed 64-bit long; 2^16 cells per
  * dimension is far finer than any realistic row-group tiling. Codegen'd
  * (static call), null-safe.
  */
case class Hilbert32(left: Expression, right: Expression)
    extends BinaryExpression with LongLongInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert32"

  override def nullSafeEval(a: Any, b: Any): Any =
    Hilbert32.index(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Hilbert32.index($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Hilbert32 {

  val Order = 16
  val Side: Long = 1L << Order // cells per dimension

  /** (x, y) → Hilbert curve distance, the classic iterative quadrant
    * walk (per-level: pick the quadrant, add its sub-curve offset,
    * rotate/reflect the frame so the child quadrant's curve starts at
    * its entry corner). Static so generated code calls it directly. */
  def index(x0: Long, y0: Long): Long = {
    if (x0 < 0 || y0 < 0 || x0 >= Side || y0 >= Side)
      throw new IllegalArgumentException(
        s"hilbert32 dimensions must be in [0, 2^$Order): got ($x0, $y0) — " +
          "map each dimension monotonically into u16 first")
    var x = x0
    var y = y0
    var d = 0L
    var s = Side >> 1
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the frame into the child quadrant
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse walk (curve distance → cell) — the spec's round-trip and
    * adjacency witness; not on any query path. */
  def inverse(d0: Long): (Long, Long) = {
    require(d0 >= 0 && d0 < Side * Side, s"hilbert32 index out of range: $d0")
    var x = 0L
    var y = 0L
    var d = d0
    var s = 1L
    while (s < Side) {
      val rx = 1L & (d / 2)
      val ry = 1L & (d ^ rx)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      x += s * rx
      y += s * ry
      d /= 4
      s <<= 1
    }
    (x, y)
  }

  /** Column API. */
  def hilbert32(a: Column, b: Column): Column =
    ColumnBridge.column(Hilbert32(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
