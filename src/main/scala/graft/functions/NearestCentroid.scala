package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Codegen'd nearest-centroid (L2) assignment against a driver-held
  * codebook.
  *
  * The codebook is a CONSTRUCTOR FIELD, not part of the expression
  * tree: the plan carries ONE node regardless of nlist (the matrix
  * ships to executors inside the task binary, which Spark torrent-
  * broadcasts once per stage — the same transport class as a broadcast
  * variable). That removes the two costs of the earlier forms at once:
  * the literal-embedded variant grew nlist×dim Literal NODES (planner
  * blow-up ~O(100) centroids), and the higher-order-function broadcast-
  * join variant ([[graft.operators.Similarity.withNearestCidJoin]])
  * evaluates through interpreted lambda dispatch per centroid —
  * measured 3-4× slower than this tight generated loop on the IVF
  * build at 200 k vectors × 512 centroids.
  *
  * Semantics are IDENTICAL to both (spec-pinned three ways): distance
  * d(c) = c2(c) − 2·dot(v, c) with the constant |v|² dropped, dot as
  * strict left-to-right double accumulation with Float→Double
  * promotion (the [[FloatArrayDot]] convention, bit-exact with the
  * DuckDB oracle's list_sum replay), argmin keeping the FIRST minimum
  * (strict <), i.e. ties break to the smallest cid.
  */
case class NearestCentroid(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  require(cents.nonEmpty, "empty codebook")
  private val dim = cents.head.length
  require(cents.forall(_.length == dim), "ragged codebook")

  // row-major flat matrix + per-centroid |c|² (left-to-right sums, the
  // same driver computation every assignment face shares)
  private lazy val flat: Array[Double] = {
    val m = new Array[Double](cents.length * dim)
    var c = 0
    while (c < cents.length) {
      System.arraycopy(cents(c), 0, m, c * dim, dim); c += 1
    }
    m
  }
  private lazy val c2: Array[Double] = cents.map(_.map(x => x * x).sum)

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"
  // the codebook must not be printed into plan strings / error messages
  override def toString: String = s"nearest_centroid($child, k=${cents.length})"

  private def childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // the null-element scan is only needed when the array TYPE admits
  // nulls — parquet embedding columns usually do (containsNull=true),
  // but literal/transform-produced arrays are often containsNull=false
  // and skip the extra per-row pass entirely
  private def mayContainNull: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float|double> input, got ${other.sql}")
  }

  // Fail-loud convention (the PpmCodec / Debezium-decoder stance): a
  // vector of the wrong dimension, or one containing null elements,
  // raises instead of yielding a wrong-but-plausible cid from a partial
  // or garbage dot product.
  private def badDim(n: Int): Nothing = throw new IllegalArgumentException(
    s"nearest_centroid: vector has $n elements, codebook dimension is $dim")
  private def badNull(t: Int): Nothing = throw new IllegalArgumentException(
    s"nearest_centroid: null element at position $t")

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) badDim(v.numElements())
    val isF = childIsFloat
    if (mayContainNull) {
      var i = 0
      while (i < dim) { if (v.isNullAt(i)) badNull(i); i += 1 }
    }
    var best = -1
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < cents.length) {
      var acc = 0.0
      val off = c * dim
      var t = 0
      while (t < dim) {
        val xv = if (isF) v.getFloat(t).toDouble else v.getDouble(t)
        acc += xv * flat(off + t)
        t += 1
      }
      val d = c2(c) - 2.0 * acc
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (childIsFloat) "getFloat" else "getDouble"
    val mRef = ctx.addReferenceObj("centMatrix", flat, "double[]")
    val c2Ref = ctx.addReferenceObj("centNorms", c2, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val off = ctx.freshName("off")
      val d = ctx.freshName("d")
      val nullScan = if (mayContainNull)
        s"""for (int $i = 0; $i < $dim; $i++) {
           |  if ($v.isNullAt($i)) {
           |    throw new IllegalArgumentException(
           |      "nearest_centroid: null element at position " + $i);
           |  }
           |}""".stripMargin
      else ""
      s"""
         |if ($v.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "nearest_centroid: vector has " + $v.numElements() +
         |    " elements, codebook dimension is " + $dim);
         |}
         |$nullScan
         |int $best = -1;
         |double $bestD = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < ${cents.length}; $c++) {
         |  double $acc = 0.0;
         |  int $off = $c * $dim;
         |  for (int $t = 0; $t < $dim; $t++) {
         |    $acc += ((double) $v.$get($t)) * $mRef[$off + $t];
         |  }
         |  double $d = $c2Ref[$c] - 2.0 * $acc;
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {
  def assign(v: Column, cents: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(v), cents))
}
