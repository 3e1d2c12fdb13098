package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.{ColumnBridge, LongNInputTypes}
import org.apache.spark.sql.types.{DataType, LongType}

/** N-dimensional Morton (Z-order) interleave — [[ZOrder64]] generalized
  * past two dimensions for the (user, time, domain) clustering family:
  * bit j of dimension i lands at output bit `j*n + i`, so every prefix
  * of the sort key carries alternating bits of ALL n dimensions and the
  * written files become ~cubic tiles — per-file `#cstat` ranges prune a
  * predicate on ANY of the n columns from one clustered copy.
  *
  * The 64-bit budget splits evenly: each dimension gets `63 / n` bits
  * (21 at n=3, 15 at n=4 — the same resolution trade Delta's multi-
  * column ZORDER BY makes), and the caller must map each dimension
  * MONOTONICALLY into that budget first ([[graft.ops.Layout.normBits]]);
  * out-of-budget values fail loudly rather than folding distant points
  * onto nearby tiles. Codegen'd (static call, no virtual dispatch);
  * NULL in any dimension → NULL code (sorts together, prunes as
  * unknown). */
case class InterleaveN(children: Seq[Expression])
    extends Expression with LongNInputTypes {

  require(children.size >= 2 && children.size <= 8,
    s"interleave_n takes 2..8 dimensions; got ${children.size}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "interleave_n"

  private val bits = InterleaveN.bitsFor(children.size)

  override def eval(input: InternalRow): Any = {
    val vs = new Array[Long](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      if (v == null) return null
      vs(i) = v.asInstanceOf[Long]
      i += 1
    }
    InterleaveN.interleave(bits, vs)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("dims")
    val anyNull =
      if (nullable) evals.map(_.isNull.toString).mkString(" || ")
      else "false"
    val fill = evals.zipWithIndex.map { case (e, i) =>
      s"$arr[$i] = ${e.value};"
    }.mkString("\n")
    val code =
      code"""
        ${evals.map(_.code).mkString("\n")}
        boolean ${ev.isNull} = $anyNull;
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          long[] $arr = new long[${children.size}];
          $fill
          ${ev.value} = graft.functions.InterleaveN.interleave($bits, $arr);
        }
      """
    if (nullable) ev.copy(code = code)
    else ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object InterleaveN {

  /** Per-dimension bit budget for an n-way split of the 63 usable
    * (non-sign) output bits. */
  def bitsFor(n: Int): Int = 63 / n

  /** Generic loop interleave: bit j of `vs(i)` → output bit `j*n + i`.
    * Static so generated code calls it directly. The loop (vs
    * [[ZOrder64]]'s mask cascade) costs ~bits·n simple ops per row —
    * a write-side layout cost only; reads never evaluate it. */
  def interleave(bits: Int, vs: Array[Long]): Long = {
    val n = vs.length
    var out = 0L
    var i = 0
    while (i < n) {
      val v = vs(i)
      if (v < 0L || (bits < 63 && (v >>> bits) != 0L))
        throw new IllegalArgumentException(
          s"interleave_n dimension $i out of budget [0, 2^$bits): $v — " +
            "map each dimension monotonically into the bit budget first")
      var j = 0
      while (j < bits) {
        out |= ((v >>> j) & 1L) << (j * n + i)
        j += 1
      }
      i += 1
    }
    out
  }

  /** Column API: the n-dim clustering code of `dims`. */
  def interleaveN(dims: Seq[Column]): Column =
    ColumnBridge.column(InterleaveN(dims.map(ColumnBridge.expression)))
}
