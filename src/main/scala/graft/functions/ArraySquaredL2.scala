package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: squared L2 distance Σ(x−y)² of two numeric
  * arrays with a double accumulator, in element order — the assignment
  * kernel of the PQ/k-means family.
  *
  * Why not `aggregate(zip_with(...))`: same reason as [[ArrayDotProduct]]
  * — Spark's higher-order functions are interpreted and allocate per
  * element, and PQ assignment evaluates this once per (vector, subspace,
  * code) pair (at the 8-bit default: 256 pairs per subvector, per Lloyd
  * iteration AND per corpus encode), which made the interpreted form the
  * whole cost of `ann_pq_train`/`ann_pq_query`. The arithmetic here is
  * the identical operation sequence (`acc += (x_i−y_i)·(x_i−y_i)` left to
  * right), so distances — and every tie-break that hangs off round-6 of
  * them — are bit-for-bit unchanged.
  *
  * Null handling: null input array → null; null element → contributes 0.
  * Length mismatch: scores min(len(a), len(b)) elements.
  */
case class ArraySquaredL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"arguments must be array<float|double>, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i) && !ys.isNullAt(i)) {
        val x = if (lf) xs.getFloat(i).toDouble else xs.getDouble(i)
        val y = if (rf) ys.getFloat(i).toDouble else ys.getDouble(i)
        val d = x - y
        acc += d * d
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val getL = if (elemType(left) == FloatType) s"(double) $a.getFloat($i)"
                 else s"$a.getDouble($i)"
      val getR = if (elemType(right) == FloatType) s"(double) $b.getFloat($i)"
                 else s"$b.getDouble($i)"
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
            double $d = ($getL) - ($getR);
            $acc += $d * $d;
          }
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ArraySquaredL2 {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      ArraySquaredL2(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
