package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: dot product of two numeric arrays
  * (float or double elements) with a double accumulator, in element order.
  *
  * Why not `aggregate(zip_with(...))`: Spark's higher-order functions are
  * interpreted (no whole-stage codegen) and allocate a lambda frame per
  * element — at N·k pair scorings (ANN, near-dup cosine) that dominates the
  * query. This expression generates a tight primitive loop inside
  * WholeStageCodegen: no boxing, no intermediate arrays. Arithmetic is
  * identical (sequential double adds), so results — and the DuckDB oracle
  * comparisons — are bit-for-bit unchanged.
  *
  * Null handling: null input array → null; null element → contributes 0.
  * Length mismatch: scores min(len(a), len(b)) elements.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
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
        acc += x * y
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      // acc must be freshName'd too: with non-nullable children the body is
      // emitted without an enclosing block scope, so a fixed name collides
      // when several ArrayDotProduct calls land in one codegen'd projection
      // (e.g. l2Distance computes three) and kills whole-stage codegen.
      val acc = ctx.freshName("acc")
      val getL = if (elemType(left) == FloatType) s"(double) $a.getFloat($i)"
                 else s"$a.getDouble($i)"
      val getR = if (elemType(right) == FloatType) s"(double) $b.getFloat($i)"
                 else s"$b.getDouble($i)"
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
            $acc += ($getL) * ($getR);
          }
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ArrayDotProduct {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      ArrayDotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
