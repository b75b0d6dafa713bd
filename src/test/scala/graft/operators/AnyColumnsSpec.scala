package graft.operators

import graft.TestSpark
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
}
