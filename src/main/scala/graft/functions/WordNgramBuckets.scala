package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** COUNTED hashed-n-gram feature buckets of a text column in one native
  * expression: tokenize (trim + `\s+`, matching `split`), build every
  * word n-gram of each order `1..nMax` (single-space joined), hash with
  * [[Hash60]], and map into `buckets` feature buckets — WITH multiplicity.
  *
  * The bag-of-hashed-n-grams twin of [[WordNgramHashes]]: that expression
  * dedupes because set operations downstream (MinHash, decontamination)
  * are duplicate-insensitive, while importance weighting and classifier
  * features are COUNT-weighted — a token occurring five times must
  * contribute five counts, so no dedup here.
  *
  * Semantically `transform(allNgrams(text, 1..nMax), g -> hash60(g) % buckets)`
  * — hash-identical to a DuckDB oracle computing exactly that
  * (`('0x' || substr(md5(g),1,15))::BIGINT % buckets`) — but fused into
  * one codegen'd loop over the token array, with all orders emitted from
  * a single tokenize. This is the per-row inner loop of DSIR-style
  * importance weighting over a full corpus: at 100 TB the tokenize+hash
  * cost IS the job, so it must stay inside WholeStageCodegen.
  */
case class WordNgramBuckets(child: Expression, nMax: Int, buckets: Int)
    extends UnaryExpression {

  require(nMax >= 1, "n-gram max order must be >= 1")
  require(buckets >= 1, "bucket count must be >= 1")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"argument must be string, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    WordNgramBuckets.compute(v.asInstanceOf[UTF8String], nMax, buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordNgramBuckets.compute($c, $nMax, $buckets)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WordNgramBuckets {

  private val Empty = new GenericArrayData(Array.emptyIntArray)

  /** All n-grams of orders 1..nMax, bucketed, multiplicity preserved.
    * Emission order (order-major, then position) is deterministic but
    * irrelevant downstream — consumers count, never zip. */
  def compute(s: UTF8String, nMax: Int, buckets: Int): ArrayData = {
    val str = s.toString.trim
    if (str.isEmpty) return Empty
    val toks = str.split("\\s+")
    var total = 0
    var n = 1
    while (n <= nMax) { total += math.max(0, toks.length - n + 1); n += 1 }
    if (total == 0) return Empty
    val out = new Array[Int](total)
    val sb = new java.lang.StringBuilder(64)
    var k = 0
    n = 1
    while (n <= nMax) {
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        // hash60 is non-negative, so % is already a bucket id
        out(k) = (Hash60.hashBytes(
          sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          % buckets).toInt
        k += 1
        i += 1
      }
      n += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, nMax: Int, buckets: Int): Column =
    ColumnBridge.column(WordNgramBuckets(ColumnBridge.expression(c), nMax, buckets))
}
