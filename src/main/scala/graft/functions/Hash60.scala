package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit md5 hash: numerically identical to
  * `conv(substring(md5(x), 1, 15), 16, 10)` (the portable oracle form:
  * DuckDB `('0x' || substr(md5(x),1,15))::BIGINT`) but computed directly
  * from the first 7.5 digest bytes — no hex-string materialization, no
  * base-16 string parse. The first 15 hex chars of the digest are its
  * first 60 bits, i.e. the big-endian first 8 bytes shifted right by 4.
  *
  * This is the inner loop of MinHash/SimHash/fingerprint/split hashing —
  * at 100 TB it runs once per shingle of the corpus, so the string round
  * trip it removes is measurable fleet time. */
case class Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"argument must be string or binary, got $t")
    }

  override def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => Hash60.hashBytes(s.getBytes)
    case b: Array[Byte] => Hash60.hashBytes(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val toBytes = child.dataType match {
      case StringType => (c: String) => s"$c.getBytes()"
      case BinaryType => (c: String) => c
    }
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Hash60.hashBytes(${toBytes(c)})")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object Hash60 {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(bytes) as a non-negative long. */
  def hashBytes(b: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(b)
    // big-endian first 8 bytes, dropped low nibble = first 15 hex digits
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def apply(c: Column): Column =
    ColumnBridge.column(Hash60(ColumnBridge.expression(c)))
}
