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

  /** Dense-union interchange — the per-CELL analog of the reference's Arrow
    * `DataType::Any` round trip (`formats/arrow_msg/src/lib.rs:639-928` as
    * spec). The LUB policy above collapses a MIXED column to string, losing
    * which cells were ints; the union encoding keeps every cell's own tag,
    * so union-in → union-out preserves per-cell types exactly.
    *
    * Encoding: `struct<tag:byte, i:long, f:double, ts:timestamp, s:string>`
    * where exactly the field selected by `tag` is non-null (a dense union's
    * type-id + child arrays, flattened into Tungsten's null bitmap — no
    * per-cell boxing, stays inside whole-stage codegen).
    */
  val TagNull: Int = 0; val TagLong: Int = 1; val TagDouble: Int = 2
  val TagTimestamp: Int = 3; val TagString: Int = 4

  val UnionType: StructType = StructType(Seq(
    StructField("tag", ByteType, nullable = false),
    StructField("i", LongType), StructField("f", DoubleType),
    StructField("ts", TimestampType), StructField("s", StringType)))

  /** String-typed "any" columns → dense union. Each cell gets the NARROWEST
    * tag that parses it, in [[infer]]'s precedence order (long, double,
    * timestamp, string) — so `["1", "2.5", "this", null]` keeps the int
    * cell an int and the text cell text. */
  def toUnion(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val targets =
      if (columns.nonEmpty) columns.toSet
      else df.schema.fields.filter(_.dataType == StringType).map(_.name).toSet
    df.select(df.columns.map { c =>
      if (!targets.contains(c)) col(c)
      else {
        val v = col(c)
        val asL = v.try_cast(LongType)
        val asD = v.try_cast(DoubleType)
        val asT = v.try_cast(TimestampType)
        val tag = when(v.isNull, lit(TagNull))
          .when(asL.isNotNull, lit(TagLong))
          .when(asD.isNotNull, lit(TagDouble))
          .when(asT.isNotNull, lit(TagTimestamp))
          .otherwise(lit(TagString)).cast(ByteType)
        struct(
          tag.as("tag"),
          when(tag === TagLong, asL).as("i"),
          when(tag === TagDouble, asD).as("f"),
          when(tag === TagTimestamp, asT).as("ts"),
          when(tag === TagString, v).as("s")).as(c)
      }
    }.toIndexedSeq: _*)
  }

  /** Dense union → string-typed "any" columns (the outbound direction; the
    * reference's non-stringify sink path in reverse). Exact for values that
    * entered [[toUnion]] in canonical rendering; DOCUMENTED-LOSSY for
    * non-canonical numerics — `"2.50"` tags as double 2.5 and re-renders
    * `"2.5"`, `"07"` re-renders `"7"` — the same narrowing the reference's
    * Excel stringify mode applies (`AnyColumnsSpec` pins both the exact and
    * the lossy cases). */
  def fromUnion(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val targets =
      if (columns.nonEmpty) columns.toSet
      else df.schema.fields.filter(_.dataType == UnionType).map(_.name).toSet
    df.select(df.columns.map { c =>
      if (!targets.contains(c)) col(c)
      else {
        val u = col(c)
        when(u("tag") === TagNull, lit(null).cast(StringType))
          .when(u("tag") === TagLong, u("i").cast(StringType))
          .when(u("tag") === TagDouble, u("f").cast(StringType))
          .when(u("tag") === TagTimestamp, u("ts").cast(StringType))
          .otherwise(u("s")).as(c)
      }
    }.toIndexedSeq: _*)
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
