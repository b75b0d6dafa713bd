package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's SQLite non-strict-typing fixture
  * (FIXTURES.md §1, `sections/sqlite_connector/tests/source.rs:18-41`):
  * columns arrive dynamically typed; our policy recovers per-column LUBs. */
class AnyColumnsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("uniformly-long strings widen to long; doubles to double; mixed stays string") {
    val df = Seq(
      ("1", "1.5", "2024-01-01 00:00:00", "foo", null.asInstanceOf[String]),
      ("2", "2", "2024-02-01 12:30:00", "7", null.asInstanceOf[String]))
      .toDF("ints", "reals", "times", "mixed", "nulls")
    val out = AnyColumns.resolve(df)
    val types = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("ints") == LongType)
    assert(types("reals") == DoubleType)
    assert(types("times") == TimestampType)
    assert(types("mixed") == StringType) // "foo" poisons the column
    assert(types("nulls") == StringType) // all-null: no evidence, keep string
    assert(out.select("ints").as[Long].collect().sorted.sameElements(Array(1L, 2L)))
  }

  test("nulls don't block widening") {
    val df = Seq(Some("10"), None, Some("30")).toDF("v")
    assert(AnyColumns.resolve(df).schema("v").dataType == LongType)
  }

  test("non-string columns are untouched") {
    val df = Seq((1, "2")).toDF("a", "b")
    val out = AnyColumns.resolve(df)
    assert(out.schema("a").dataType == IntegerType)
    assert(out.schema("b").dataType == LongType)
  }

  test("sqlite non-strict fixture: mixed id column survives as string") {
    // FIXTURES.md rows: id column holds 1, 2, 'this', ''
    val df = Seq("1", "2", "this", "").toDF("id")
    val out = AnyColumns.resolve(df)
    assert(out.schema("id").dataType == StringType)
    assert(out.count() == 4)
  }

  // --- dense-union round trip: the per-cell analog of the reference's
  // Arrow DataType::Any interchange (formats/arrow_msg/src/lib.rs:639-928
  // as spec). union in → union out must preserve per-cell types, which
  // the LUB policy alone (mixed → string) cannot.

  test("dense union: mixed int/real/ts/str/null cells each keep their own tag") {
    val df = Seq(("1", 10L), ("2.5", 11L), ("2024-01-01 00:00:00", 12L),
      ("this", 13L), (null.asInstanceOf[String], 14L)).toDF("v", "k")
    val u = AnyColumns.toUnion(df, Seq("v"))
    assert(u.schema("v").dataType == AnyColumns.UnionType)
    assert(u.schema("k").dataType == LongType, "non-target columns untouched")
    val byK = u.select("k", "v.tag", "v.i", "v.f", "v.s").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(byK(10L).getByte(1) == AnyColumns.TagLong && byK(10L).getLong(2) == 1L)
    assert(byK(11L).getByte(1) == AnyColumns.TagDouble && byK(11L).getDouble(3) == 2.5)
    assert(byK(12L).getByte(1) == AnyColumns.TagTimestamp)
    assert(byK(13L).getByte(1) == AnyColumns.TagString && byK(13L).getString(4) == "this")
    assert(byK(14L).getByte(1) == AnyColumns.TagNull)
    // dense-union invariant: exactly the tag-selected child is populated
    val strays = u.filter(
      (col("v.tag") =!= AnyColumns.TagLong && col("v.i").isNotNull) ||
      (col("v.tag") =!= AnyColumns.TagDouble && col("v.f").isNotNull) ||
      (col("v.tag") =!= AnyColumns.TagTimestamp && col("v.ts").isNotNull) ||
      (col("v.tag") =!= AnyColumns.TagString && col("v.s").isNotNull)).count()
    assert(strays == 0)
  }

  test("dense union round trip is exact for canonical renderings (both directions)") {
    val vals = Seq("1", "-42", "2.5", "2024-01-01 00:00:00", "this", "", null)
    val df = vals.zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("v", "k")
    val back = AnyColumns.fromUnion(AnyColumns.toUnion(df, Seq("v")), Seq("v"))
      .orderBy("k").select("v").collect().map(r => Option(r.getString(0)))
    assert(back.toSeq == vals.map(Option(_)),
      "union-in -> union-out must reproduce every canonical cell, typed and text alike")
    // and the reverse composition: a typed frame stringified through the
    // union re-resolves to the same LUB types it started with
    val typed = Seq((1L, 2.5, "x")).toDF("a", "b", "c")
      .selectExpr("cast(a as string) a", "cast(b as string) b", "c")
    val again = AnyColumns.resolve(
      AnyColumns.fromUnion(AnyColumns.toUnion(typed)))
    assert(again.schema("a").dataType == LongType)
    assert(again.schema("b").dataType == DoubleType)
    assert(again.schema("c").dataType == StringType)
  }

  test("dense union documented-lossy cases: non-canonical numerics re-render narrowed") {
    // "2.50" tags as double 2.5 -> "2.5"; "07" tags as long 7 -> "7".
    // This is the Excel-stringify narrowing the scaladoc documents, NOT a
    // silent bug — pin it so a behavior change is deliberate.
    val df = Seq("2.50", "07").toDF("v")
    val back = AnyColumns.fromUnion(AnyColumns.toUnion(df, Seq("v")), Seq("v"))
      .collect().map(_.getString(0)).toSet
    assert(back == Set("2.5", "7"))
  }

  test("sqlite mixed fixture through the union keeps 1 and 2 as ints, 'this' as text") {
    val df = Seq("1", "2", "this", "").toDF("id")
    val u = AnyColumns.toUnion(df, Seq("id"))
    val tags = u.groupBy(col("id.tag")).count().collect()
      .map(r => r.getByte(0).toInt -> r.getLong(1)).toMap
    assert(tags == Map(AnyColumns.TagLong -> 2L, AnyColumns.TagString -> 2L))
  }
}
