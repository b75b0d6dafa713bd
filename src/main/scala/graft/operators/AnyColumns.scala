package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Policy for the reference's `DataType::Any` columns — SURVEY §7.3 "hard
  * part #1". The reference lets every cell carry its own runtime type
  * (SQLite non-strict rows, Excel non-stringify mode, Arrow dense unions);
  * Spark has no union type. Our policy, per SURVEY:
  *
  *   ingest as string → infer the per-column least upper bound over the
  *   OBSERVED values → widen-cast columns whose every non-null value fits;
  *   anything mixed stays string (the reference's own Snowflake sink simply
  *   rejects Any columns; Excel stringifies — we stringify but recover
  *   typed columns when the data allows).
  *
  * Mechanics: ONE aggregation pass computes, per candidate column, the
  * count of non-null values and the counts parseable as long/double/
  * timestamp (`try_cast` → null on failure, so a count comparison decides).
  * The driver then picks the narrowest type covering all values and emits
  * one cast projection. Two scans total, no shuffle beyond the single-row
  * aggregate — at 100 TB the inference pass is a plain columnar scan and
  * the decision state is O(#columns).
  */
object AnyColumns {

  sealed trait Lub { def sparkType: DataType }
  case object LubLong extends Lub { val sparkType: DataType = LongType }
  case object LubDouble extends Lub { val sparkType: DataType = DoubleType }
  case object LubTimestamp extends Lub { val sparkType: DataType = TimestampType }
  case object LubString extends Lub { val sparkType: DataType = StringType }

  /** Infer the LUB for each named (string-typed) column. */
  def infer(df: DataFrame, columns: Seq[String]): Map[String, Lub] = {
    if (columns.isEmpty) return Map.empty
    val aggs = columns.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        count(col(c).try_cast(LongType)).as(s"${c}__long"),
        count(col(c).try_cast(DoubleType)).as(s"${c}__dbl"),
        count(col(c).try_cast(TimestampType)).as(s"${c}__ts"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    columns.map { c =>
      val n = row.getAs[Long](s"${c}__n")
      val asLong = row.getAs[Long](s"${c}__long")
      val asDbl = row.getAs[Long](s"${c}__dbl")
      val asTs = row.getAs[Long](s"${c}__ts")
      val lub =
        if (n == 0) LubString // all null: keep string
        else if (asLong == n) LubLong
        else if (asDbl == n) LubDouble
        else if (asTs == n) LubTimestamp
        else LubString
      c -> lub
    }.toMap
  }

  /** Apply the widening policy: string columns that uniformly parse become
    * typed; mixed columns stay string. */
  def resolve(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val candidates =
      if (columns.nonEmpty) columns
      else df.schema.fields.filter(_.dataType == StringType).map(_.name).toSeq
    val lubs = infer(df, candidates)
    df.select(df.columns.map { c =>
      lubs.get(c) match {
        case Some(l) if l != LubString => col(c).cast(l.sparkType).as(c)
        case _ => col(c)
      }
    }.toIndexedSeq: _*)
  }
}
