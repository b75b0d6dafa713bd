package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Against a committed fixture generated with stock SQLite (python
  * sqlite3): the reference's non-strict-typing rows (FIXTURES.md §1), a
  * 2000-row table forcing interior B-tree pages and overflow chains, and a
  * small plain table. */
class SqliteFileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fixture = getClass.getResource("/fixture.db").getPath
  private lazy val bytes = java.nio.file.Files.readAllBytes(
    java.nio.file.Paths.get(fixture))

  test("column names parse from CREATE TABLE") {
    assert(SqliteFile.tableColumns(bytes, "test") ==
      Seq("id", "text", "bin", "float", "some_null"))
    assert(SqliteFile.tableColumns(bytes, "words") == Seq("w", "n"))
  }

  test("non-strict fixture rows decode with per-cell dynamic types") {
    val rows = SqliteFile.readTable(bytes, "test")
    assert(rows.length == 4)
    val byId = rows.map(r => r.head -> r).toMap
    assert(byId("1") == Seq("1", "foo", "foo", "1", null))     // int in float col
    assert(byId("2") == Seq("2", "bar", null, "0.2", null))
    assert(byId("3") == Seq("3", "is", "not", "strict", null)) // text in float col
    assert(byId("4")(3) == "62696e")                           // blob → hex
  }

  test("interior pages + overflow chains: 2000 long rows round-trip") {
    val rows = SqliteFile.readTable(bytes, "big")
    assert(rows.length == 2000)
    val totalPayload = rows.map(_(1).length.toLong).sum
    assert(totalPayload == 683890L) // sum(length(payload)) per generator
    assert(rows.map(_.head.toLong).sorted.sameElements(0L until 2000L))
    // spot-check a row that spilled to overflow pages
    val r1500 = rows.find(_.head == "1500").get
    assert(r1500(1) == "row1500_" + "x" * (1500 % 700))
  }

  test("DataFrame surface: stringify and LUB-typed modes") {
    val df = SqliteFile.read(spark, fixture, "words")
    assert(df.columns.toSeq == Seq("origin", "w", "n"))
    assert(df.count() == 4)
    val typed = SqliteFile.read(spark, fixture, "words", stringify = false)
    assert(typed.schema("n").dataType == org.apache.spark.sql.types.LongType)
    assert(typed.schema("w").dataType == org.apache.spark.sql.types.StringType)
  }

  test("rowid-alias integer primary key is materialized") {
    val ids = SqliteFile.readTable(bytes, "test").map(_.head)
    assert(ids.sorted == Seq("1", "2", "3", "4"))
  }

  test("unknown table errors clearly") {
    intercept[IllegalArgumentException](SqliteFile.readTable(bytes, "nope"))
  }
}
