package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte length of a string — the compression-ratio
  * quality signal (low `deflated/raw` ⇒ highly repetitive boilerplate;
  * the cheap single-pass cousin of the repeated-n-gram battery, used as a
  * pre-filter in CommonCrawl-scale pipelines). Computed with the JDK's
  * raw-deflate `Deflater` at BEST_SPEED with a fixed strategy, so the
  * value is deterministic for a given input on every JVM executor — but
  * it is NOT portable to non-JVM engines (zlib versions differ), so
  * queries built on it verify by ScalaTest properties, not a DuckDB
  * oracle.
  *
  * Shape: a narrow per-row expression with codegen (one shared static
  * call, like [[Hash60]]) — the corpus never shuffles to be scored, and
  * the `Deflater` is allocated per CALL, not per JVM, because native zlib
  * streams are not thread-safe to share.
  */
case class DeflateLength(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"argument must be string or binary, got $t")
    }

  override def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => DeflateLength.deflatedLen(s.getBytes)
    case b: Array[Byte] => DeflateLength.deflatedLen(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val toBytes = child.dataType match {
      case StringType => (c: String) => s"$c.getBytes()"
      case BinaryType => (c: String) => c
    }
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DeflateLength.deflatedLen(${toBytes(c)})")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object DeflateLength {

  /** Raw-deflate (no zlib header) length at BEST_SPEED, DEFAULT_STRATEGY. */
  def deflatedLen(b: Array[Byte]): Long = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true)
    try {
      d.setInput(b)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  def apply(c: Column): Column =
    ColumnBridge.column(DeflateLength(ColumnBridge.expression(c)))
}
