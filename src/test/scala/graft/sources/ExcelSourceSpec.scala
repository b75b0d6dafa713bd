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

  /** Two-sheet workbook with non-sequential part numbering: names resolve
    * through r:id + workbook.xml.rels ("a"→sheet7.xml, "b"→sheet2.xml). */
  private def writeXlsxMulti(path: java.nio.file.Path): Unit = {
    val zos = new ZipOutputStream(Files.newOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns:r="http://x"><sheets>
        <sheet name="a" sheetId="1" r:id="rId9"/>
        <sheet name="b" sheetId="2" r:id="rId3"/>
        </sheets></workbook>""")
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships>
        <Relationship Id="rId9" Type="http://x/worksheet" Target="worksheets/sheet7.xml"/>
        <Relationship Id="rId3" Type="http://x/worksheet" Target="/xl/worksheets/sheet2.xml"/>
        </Relationships>""")
    def sheetXml(rows: Seq[(String, String)]): String = {
      val body = rows.zipWithIndex.map { case ((a, b), i) =>
        s"""<row r="${i + 1}"><c r="A${i + 1}" t="inlineStr"><is><t>$a</t></is></c>
            <c r="B${i + 1}" t="inlineStr"><is><t>$b</t></is></c></row>"""
      }.mkString
      s"""<?xml version="1.0"?><worksheet><sheetData>$body</sheetData></worksheet>"""
    }
    put("xl/worksheets/sheet7.xml",
      sheetXml(Seq("k" -> "v", "a1" -> "x", "a2" -> "y")))
    put("xl/worksheets/sheet2.xml",
      sheetXml(Seq("k" -> "v", "b1" -> "z")))
    zos.close()
  }

  test("sheet='*' drops each sheet's header row, not just the first sheet's") {
    val dir = Files.createTempDirectory("graft_xlsx4")
    writeXlsxMulti(dir.resolve("multi.xlsx"))
    val df = ExcelSource.read(spark, s"$dir/multi.xlsx", stringify = true)
    assert(df.columns.toSeq == Seq("origin", "k", "v"))
    val ks = df.select("k").as[String].collect().sorted.toSeq
    assert(ks == Seq("a1", "a2", "b1")) // no stray "k" header rows
  }

  test("sheet names resolve via r:id rels, not positional sheetN numbering") {
    val dir = Files.createTempDirectory("graft_xlsx5")
    writeXlsxMulti(dir.resolve("multi.xlsx"))
    val a = ExcelSource.read(spark, s"$dir/multi.xlsx", sheet = "a")
    val b = ExcelSource.read(spark, s"$dir/multi.xlsx", sheet = "b")
    assert(a.select("k").as[String].collect().sorted.toSeq == Seq("a1", "a2"))
    assert(b.select("k").as[String].collect().toSeq == Seq("b1"))
  }

  /** Single-sheet workbook with an arbitrary inline-string header+rows. */
  private def writeXlsxSimple(path: java.nio.file.Path, rows: Seq[Seq[String]]): Unit = {
    val zos = new ZipOutputStream(Files.newOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook><sheets>
        <sheet name="data" sheetId="1"/></sheets></workbook>""")
    val body = rows.zipWithIndex.map { case (cells, i) =>
      val cs = cells.zipWithIndex.map { case (v, j) =>
        val ref = s"${('A' + j).toChar}${i + 1}"
        s"""<c r="$ref" t="inlineStr"><is><t>$v</t></is></c>"""
      }.mkString
      s"""<row r="${i + 1}">$cs</row>"""
    }.mkString
    put("xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0"?><worksheet><sheetData>$body</sheetData></worksheet>""")
    zos.close()
  }

  test("globbed workbooks with mismatched headers fail loudly, not position-align") {
    val dir = Files.createTempDirectory("graft_xlsx6")
    writeXlsxSimple(dir.resolve("one.xlsx"),
      Seq(Seq("id", "name"), Seq("1", "a")))
    writeXlsxSimple(dir.resolve("two.xlsx"),
      Seq(Seq("id", "price"), Seq("2", "9.99")))
    val e = intercept[org.apache.spark.SparkException] {
      ExcelSource.read(spark, s"$dir/*.xlsx", stringify = true).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("schema drift")),
      s"expected schema-drift error, got: ${msgs(e).mkString(" | ")}")
  }

  test("globbed workbooks with identical headers read together") {
    val dir = Files.createTempDirectory("graft_xlsx7")
    writeXlsxSimple(dir.resolve("one.xlsx"),
      Seq(Seq("id", "name"), Seq("1", "a")))
    writeXlsxSimple(dir.resolve("two.xlsx"),
      Seq(Seq("id", "name"), Seq("2", "b")))
    val df = ExcelSource.read(spark, s"$dir/*.xlsx", stringify = true)
    assert(df.select("id").as[String].collect().sorted.toSeq == Seq("1", "2"))
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

  test("malformed containers fail loudly, never parse as an empty workbook") {
    // a bare CFB header with no filesystem inside — corrupt, not legacy
    val cfb = Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1)
      .map(_.toByte) ++ Array.fill[Byte](504)(0)
    intercept[Exception] { ExcelSource.parseWorkbook(cfb, "*") }
    // arbitrary non-zip non-CFB bytes get the unknown-format error
    val e = intercept[IllegalArgumentException] {
      ExcelSource.parseWorkbook("not a workbook at all".getBytes, "*")
    }
    assert(e.getMessage.contains("unknown container"), e.getMessage)
  }

  test("legacy BIFF8 .xls parses: SST, numerics, RK forms, formulas, sheets") {
    val rows = ExcelSource.parseWorkbookSheets(BiffFixture.standardXls(), "Alpha")
    assert(rows.size == 1)
    assert(rows.head == Seq(
      Seq("name", "qty", "price"),
      Seq("ada", "3", "2.5"),
      Seq("bob", "7", "0.07")))
    val beta = ExcelSource.parseWorkbookSheets(BiffFixture.standardXls(), "Beta")
    assert(beta.head == Seq(
      Seq("name", "qty", "price"),
      Seq("grace", "42", "1"), // cached formula result; bool as raw 1/0
      Seq("hello")))           // string-formula result via STRING record
    // "*" returns both sheets in workbook order
    assert(ExcelSource.parseWorkbookSheets(BiffFixture.standardXls(), "*")
      .map(_.size) == Seq(3, 3))
    intercept[IllegalArgumentException] {
      ExcelSource.parseWorkbookSheets(BiffFixture.standardXls(), "nope")
    }
  }

  test("BIFF8 .xls over the 4096-byte cutoff reads through the regular FAT") {
    // the small fixture lives in the CFB mini stream; padding the globals
    // pushes the stream over the cutoff into regular FAT sectors — both
    // container layouts must parse identically
    val small = ExcelSource.parseWorkbookSheets(BiffFixture.standardXls(), "*")
    val large = ExcelSource.parseWorkbookSheets(
      BiffFixture.standardXls(padGlobals = 8000), "*")
    assert(small == large)
  }

  test("BIFF8 .xls reads end-to-end through the Spark source (header schema, typing)") {
    val dir = Files.createTempDirectory("graft_xls")
    Files.write(dir.resolve("legacy.xls"), BiffFixture.standardXls())
    val df = ExcelSource.read(spark, s"$dir/legacy.xls", sheet = "Alpha",
      stringify = false)
    assert(df.columns.toSeq == Seq("origin", "name", "qty", "price"))
    import spark.implicits._
    val got = df.select("name", "qty", "price")
      .as[(String, Long, Double)].collect().toSet
    assert(got == Set(("ada", 3L, 2.5), ("bob", 7L, 0.07)))
  }

  test("BIFF8 SST spilling into CONTINUE records parses, including a mid-string encoding switch") {
    val (sstBytes, strings) = BiffFixture.sstWithContinue()
    val sheet = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(BiffFixture.bof(0x0010))
      strings.indices.foreach(i => out.write(BiffFixture.labelSst(0, i, i)))
      // reversed references on row 1: every isst must resolve, not just
      // the ones before the first spill
      strings.indices.foreach(i =>
        out.write(BiffFixture.labelSst(1, i, strings.size - 1 - i)))
      out.write(BiffFixture.eof)
      out.toByteArray
    }
    val xls = BiffFixture.cfb(BiffFixture.workbookStream(Nil,
      Seq("Cont" -> sheet), sstOverride = Some(sstBytes)))
    val rows = ExcelSource.parseWorkbookSheets(xls, "Cont")
    assert(rows.head == Seq(strings, strings.reverse),
      s"CONTINUE-spilled SST must reassemble exactly: ${rows.head}")
  }

  test("BIFF5 (Excel 5.0/95) parses: inline ANSI labels, RSTRING, codepage, formulas") {
    val xls = BiffFixture.standardXls5()
    val alpha = ExcelSource.parseWorkbookSheets(xls, "Alpha")
    assert(alpha.head == Seq(
      Seq("name", "qty", "price"),
      Seq("ada", "3", "2.5"),
      Seq("café", "7", "0.07")), // RSTRING text, cp1252 é, runs skipped
      alpha.head.toString)
    val beta = ExcelSource.parseWorkbookSheets(xls, "Beta")
    assert(beta.head == Seq(
      Seq("name", "qty"),
      Seq("grace", "42"),
      Seq("hello", "0")), // string-formula via BIFF5 STRING; bool raw 0
      beta.head.toString)
    assert(ExcelSource.parseWorkbookSheets(xls, "*").map(_.size) == Seq(3, 3))
  }

  test("BIFF5 .xls reads end-to-end through the Spark source") {
    val dir = Files.createTempDirectory("graft_xls5")
    Files.write(dir.resolve("excel95.xls"), BiffFixture.standardXls5())
    val df = ExcelSource.read(spark, s"$dir/excel95.xls", sheet = "Alpha",
      stringify = false)
    assert(df.columns.toSeq == Seq("origin", "name", "qty", "price"))
    import spark.implicits._
    val got = df.select("name", "qty", "price")
      .as[(String, Long, Double)].collect().toSet
    assert(got == Set(("ada", 3L, 2.5), ("café", 7L, 0.07)))
  }

  test("pre-BIFF5 workbooks are rejected with the version named") {
    // same CFB container, but the stream's BOF declares BIFF4 (0x0400)
    val stream = BiffFixture.rec(0x0809,
      BiffFixture.u16(0x0400) ++ BiffFixture.u16(0x0005) ++
      Array.fill[Byte](12)(0)) ++ BiffFixture.eof
    val e = intercept[IllegalArgumentException] {
      ExcelSource.parseWorkbookSheets(BiffFixture.cfb(stream, "Book"), "*")
    }
    assert(e.getMessage.contains("BIFF8"), e.getMessage)
  }
}
