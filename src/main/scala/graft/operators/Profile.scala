package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Data profiling — the production extension of the `inspect` tap: one
  * aggregation pass computing per-column health metrics (row count, null
  * counts, distinct cardinalities, numeric min/max/mean, string length
  * stats). Exactly one job over the data, partial-aggregated map-side;
  * output is O(#columns) regardless of input size. */
object Profile {

  /** Wide single-row summary: `<col>_nulls`, `<col>_distinct`, and for
    * numeric columns `<col>_min`/`<col>_max`, for strings `<col>_maxlen`. */
  def summarize(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      val base = Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_distinct"))
      fields(c) match {
        case _: NumericType => base ++ Seq(
          min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))
        // long, matching SQL engines where length() is BIGINT
        case StringType => base :+ max(length(col(c)).cast("long")).as(s"${c}_maxlen")
        case _ => base
      }
    }
    df.agg(aggs.head, aggs.tail: _*)
  }
}
