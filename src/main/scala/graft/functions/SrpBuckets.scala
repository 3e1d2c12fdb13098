package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Codegen'd multi-table SRP bucketing: ALL `tables` bucket ids of a
  * vector in one pass.
  *
  * The composed form — `array(srpBucket(v, planes_0), …)` with one
  * [[FloatArrayDot]] against a 64-literal `array(...)` per hyperplane —
  * grows tables×planes dot NODES each rebuilding its plane array per
  * row; at the adaptive near-dup sizing (17 tables × 10 planes at 20 k
  * vectors) the projection fell out of whole-stage codegen and the
  * bucketing stage alone measured 18.5 s of a 26 s query
  * (FullSurfaceBench round-10). This node is the [[NearestCentroid]]
  * treatment of the same problem: the full plane matrix is a
  * CONSTRUCTOR FIELD (one plan node regardless of sizing; ships in the
  * task binary, torrent-broadcast once per stage), and evaluation is a
  * tight tables×planes×dim primitive loop.
  *
  * Semantics are BIT-IDENTICAL to the composed form (spec-pinned):
  * dot as strict left-to-right double accumulation with Float→Double
  * promotion over min(|v|, dim) elements (the [[FloatArrayDot]]
  * convention), bit j of table t set iff dot(v, plane_{t,j}) > 0,
  * buckets ordered by table — `posexplode` yields the same
  * (tbl, bucket) rows either way.
  */
case class SrpBuckets(child: Expression, planes: Array[Array[Double]],
    tables: Int) extends UnaryExpression {

  require(tables > 0, "tables must be positive")
  require(planes.nonEmpty && planes.length % tables == 0,
    s"plane count ${planes.length} not a multiple of tables=$tables")
  private val perTable = planes.length / tables
  private val dim = planes.head.length
  require(planes.forall(_.length == dim), "ragged plane matrix")
  require(perTable < 63, "bucket bits must fit a long")

  // row-major flat matrix, the NearestCentroid layout
  private lazy val flat: Array[Double] = {
    val m = new Array[Double](planes.length * dim)
    var p = 0
    while (p < planes.length) {
      System.arraycopy(planes(p), 0, m, p * dim, dim); p += 1
    }
    m
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_buckets"
  // the plane matrix must not be printed into plan strings
  override def toString: String =
    s"srp_buckets($child, tables=$tables, planes=$perTable)"

  private def childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float|double> input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isF = childIsFloat
    val n = math.min(v.numElements(), dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var j = 0
      while (j < perTable) {
        val off = (t * perTable + j) * dim
        var acc = 0.0
        var i = 0
        while (i < n) {
          val xv = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
          acc += xv * flat(off + i)
          i += 1
        }
        if (acc > 0.0) bucket += (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (childIsFloat) "getFloat" else "getDouble"
    val mRef = ctx.addReferenceObj("srpPlanes", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val off = ctx.freshName("off")
      val bucket = ctx.freshName("bucket")
      s"""
         |long[] $out = new long[$tables];
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $bucket = 0L;
         |  for (int $j = 0; $j < $perTable; $j++) {
         |    int $off = ($t * $perTable + $j) * $dim;
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += ((double) $v.$get($i)) * $mRef[$off + $i];
         |    }
         |    if ($acc > 0.0) $bucket += (1L << $j);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpBuckets {
  /** All `tables` bucket ids for `v` — `planesFlat` is the
    * table-major concatenation of each table's hyperplanes. */
  def buckets(v: Column, planesFlat: Array[Array[Double]],
      tables: Int): Column =
    ColumnBridge.column(
      SrpBuckets(ColumnBridge.expression(v), planesFlat, tables))
}
