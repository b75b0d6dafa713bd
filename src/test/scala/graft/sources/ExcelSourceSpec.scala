package graft.sources

import graft.TestSpark
import org.apache.spark.sql.types.{LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

class ExcelSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Build a minimal real .xlsx (zip of XML parts) with shared strings,
    * inline strings, and numeric cells. */
  private def writeXlsx(path: java.nio.file.Path): Unit = {
    val zos = new ZipOutputStream(Files.newOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook><sheets>
        <sheet name="data" sheetId="1" r:id="rId1" xmlns:r="http://x"/>
        </sheets></workbook>""")
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst><si><t>id</t></si><si><t>name</t></si>
        <si><t>score</t></si><si><t>alpha</t></si></sst>""")
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>
        <row r="2"><c r="A2"><v>1</v></c><c r="B2" t="s"><v>3</v></c><c r="C2"><v>9.5</v></c></row>
        <row r="3"><c r="A3"><v>2</v></c><c r="B3" t="inlineStr"><is><t>beta</t></is></c><c r="C3"><v>7</v></c></row>
        </sheetData></worksheet>""")
    zos.close()
  }

  test("xlsx parses: shared strings, inline strings, numerics, header schema") {
    val dir = Files.createTempDirectory("graft_xlsx")
    writeXlsx(dir.resolve("book.xlsx"))
    val df = ExcelSource.read(spark, s"$dir/book.xlsx", stringify = true)
    assert(df.columns.toSeq == Seq("origin", "id", "name", "score"))
    assert(df.schema.fields.filter(_.name != "origin").forall(_.dataType == StringType))
    val rows = df.select("id", "name", "score").as[(String, String, String)]
      .collect().sortBy(_._1)
    assert(rows.toSeq == Seq(("1", "alpha", "9.5"), ("2", "beta", "7")))
  }

  test("stringify=false applies LUB widening (reference Any semantics)") {
    val dir = Files.createTempDirectory("graft_xlsx2")
    writeXlsx(dir.resolve("book.xlsx"))
    val df = ExcelSource.read(spark, s"$dir/book.xlsx", stringify = false)
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("id") == LongType)      // 1, 2 → long
    assert(types("name") == StringType)  // alpha/beta
    assert(types("score").typeName == "double") // 9.5, 7
  }

  test("named sheet selection and missing sheet error") {
    val dir = Files.createTempDirectory("graft_xlsx3")
    writeXlsx(dir.resolve("book.xlsx"))
    assert(ExcelSource.read(spark, s"$dir/book.xlsx", sheet = "data").count() == 2)
    intercept[IllegalArgumentException] {
      ExcelSource.parseWorkbook(
        Files.readAllBytes(dir.resolve("book.xlsx")), "nope")
    }
  }
}
