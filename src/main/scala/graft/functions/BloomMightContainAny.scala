package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: does ANY element of a `array<bigint>`
  * column might-match a BROADCAST Bloom filter?
  *
  * Why not the scala `udf()` it replaces (the one udf left in main, the
  * decontamination prefilter `Corpus.deconBloom`): a udf forces
  * deserialization of every gram array into a boxed `Seq[Long]` and
  * drops the filter scan out of WholeStageCodegen — the exact overhead
  * every other text kernel here avoids. This expression generates a
  * primitive short-circuit loop over the unboxed `ArrayData` inside the
  * scan's codegen stage.
  *
  * Why not Spark's own `might_contain`: it accepts the serialized filter
  * as a plan-embedded literal/scalar subquery — at the 100 TB posture
  * the filter is ~100 MB and must ride the TORRENT broadcast machinery
  * (fetched once per executor), not the task binary (shipped per task).
  * The expression therefore holds the `Broadcast` HANDLE — small, ships
  * in the codegen references array — and dereferences `.value()` once
  * per partition-evaluation on the executor, same distribution cost as
  * the udf's closure-captured broadcast.
  *
  * Null handling mirrors the udf: null array → false (not null — the
  * prefilter treats a gram-less doc as clean); null elements skipped. */
case class BloomMightContainAny(child: Expression,
                                bfB: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"argument must be array<bigint>, got $other")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false
    else {
      val arr = v.asInstanceOf[ArrayData]
      val bf = bfB.value
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i) && bf.mightContainLong(arr.getLong(i))) return true
        i += 1
      }
      false
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bfB,
      classOf[Broadcast[BloomFilter]].getName)
    val childGen = child.genCode(ctx)
    val bf = ctx.freshName("bf")
    val arr = ctx.freshName("arr")
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.value} = false;
        if (!${childGen.isNull}) {
          org.apache.spark.util.sketch.BloomFilter $bf =
            (org.apache.spark.util.sketch.BloomFilter) $bcRef.value();
          org.apache.spark.sql.catalyst.util.ArrayData $arr = ${childGen.value};
          int $n = $arr.numElements();
          for (int $i = 0; $i < $n; $i++) {
            if (!$arr.isNullAt($i) && $bf.mightContainLong($arr.getLong($i))) {
              ${ev.value} = true;
              break;
            }
          }
        }
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContainAny {
  def apply(grams: Column, bfB: Broadcast[BloomFilter]): Column =
    ColumnBridge.column(
      BloomMightContainAny(ColumnBridge.expression(grams), bfB))
}
