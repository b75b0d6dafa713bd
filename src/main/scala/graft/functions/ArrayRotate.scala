package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: dense orthogonal-rotation matrix-vector
  * product `y[i] = round(Σ_j R[i][j]·x[j], 6)` — the OPQ pre-transform
  * (Ge et al., "Optimized Product Quantization", CVPR 2013; the FAISS
  * `OPQMatrix` index pretransform). The matrix rides the plan as a
  * broadcast-referenced driver object (`ctx.addReferenceObj`), never a
  * per-row literal.
  *
  * Why a custom expression and not `transform(sequence, i ->
  * aggregate(zip_with(slice(...))))`: the higher-order form is
  * interpreted and allocates a `dims`-element slice per OUTPUT
  * coordinate — O(dims²) interpreted steps and O(dims) allocations per
  * row on the serving path that every OPQ encode/query runs over the
  * whole corpus. This loop is codegen'd, allocation-free per element,
  * and stays inside WholeStageCodegen.
  *
  * Exactness contract (what the SQL oracle replays): per output
  * coordinate a plain left-to-right double fold over j = 0..dims−1
  * (`acc += R[i][j]·x[j]` — DuckDB's ordered `list_sum(list_transform)`
  * shape), then the engine Round rule (BigDecimal of the shortest
  * decimal repr, HALF_UP; non-finite pass through). Null input array →
  * null; null ELEMENT contributes 0 (the [[ArrayDotProduct]]
  * convention); input shorter than `dims` scores the missing tail as 0.
  */
case class ArrayRotate(child: Expression, rot: Array[Double], dims: Int)
    extends UnaryExpression {

  require(rot.length == dims * dims,
    s"rotation matrix must be dims² = ${dims * dims} values row-major, " +
      s"got ${rot.length}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"argument must be array<float|double>, got $t")
    }

  override def nullSafeEval(v: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), dims)
    val lf = elemIsFloat
    val out = new Array[Double](dims)
    var i = 0
    while (i < dims) {
      val off = i * dims
      var acc = 0.0
      var j = 0
      while (j < n) {
        if (!xs.isNullAt(j)) {
          val x = if (lf) xs.getFloat(j).toDouble else xs.getDouble(j)
          acc += rot(off + j) * x
        }
        j += 1
      }
      out(i) = ArrayRotate.round6(acc)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val rotRef = ctx.addReferenceObj("rot", rot, "double[]")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      val get = if (elemIsFloat) s"(double) $a.getFloat($j)"
                else s"$a.getDouble($j)"
      s"""
        int $n = java.lang.Math.min($a.numElements(), $dims);
        double[] $out = new double[$dims];
        for (int $i = 0; $i < $dims; $i++) {
          int $off = $i * $dims;
          double $acc = 0.0;
          for (int $j = 0; $j < $n; $j++) {
            if (!$a.isNullAt($j)) {
              $acc += $rotRef[$off + $j] * ($get);
            }
          }
          $out[$i] = graft.functions.ArrayRotate.round6($acc);
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ArrayRotate {

  /** The Round expression's rule at scale 6: BigDecimal of the shortest
    * decimal repr, HALF_UP; NaN/Inf pass through. Public because
    * generated code calls it. */
  def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def apply(a: Column, rot: Array[Double], dims: Int): Column =
    ColumnBridge.column(ArrayRotate(ColumnBridge.expression(a), rot, dims))
}
