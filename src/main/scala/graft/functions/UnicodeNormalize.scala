package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a codegen'd expression — the canonical first
  * step of corpus text cleaning: composed vs decomposed forms ("é" as
  * U+00E9 vs e+U+0301) must hash/shingle/dedup identically, so every
  * hash-based operator upstream of this normalizes or silently misses
  * duplicates. Wraps the JDK's `java.text.Normalizer` (Unicode TR#15,
  * the same algorithm ICU-based engines implement, so NFC output is
  * cross-engine stable).
  *
  * @param form "NFC" | "NFD" | "NFKC" | "NFKD"
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType if UnicodeNormalize.forms.contains(form) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"form must be one of ${UnicodeNormalize.forms.mkString("|")}, got $form")
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"argument must be string, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    UnicodeNormalize.normalize(v.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.UnicodeNormalize.normalize($c, "$form")""")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object UnicodeNormalize {
  private[functions] val forms = Set("NFC", "NFD", "NFKC", "NFKD")

  def normalize(s: UTF8String, form: String): UTF8String = {
    val in = s.toString
    // fast path: most corpus text is already normalized ASCII — skip the
    // allocation when the normalizer would be a no-op
    val f = java.text.Normalizer.Form.valueOf(form)
    if (java.text.Normalizer.isNormalized(in, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(in, f))
  }

  def apply(c: Column, form: String = "NFC"): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), form))
}
