package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** Real .xlsx source (reference S5, `sections/excel_connector/src/source.rs`):
  * header row = schema, `stringify` → all string columns, else typed via
  * the [[graft.operators.AnyColumns]] LUB policy (the reference's `Any`).
  *
  * xlsx is a zip of XML parts; both are parsed with pure JDK machinery
  * (ZipInputStream + StAX), no external codec. Distribution model: files
  * are listed/read by Spark's binaryFile source, and each file's sheets are
  * parsed inside a `flatMap` on executors — one task per file, the correct
  * granularity for a format whose unit of parallelism is the workbook.
  * Only the schema probe (header row of the first file) runs on the
  * driver, mirroring CSV header inference.
  */
object ExcelSource {

  /** Read workbooks matching `path` (glob ok). `sheet` = name or "*". */
  def read(spark: SparkSession, path: String, sheet: String = "*",
           stringify: Boolean = true): DataFrame = {
    val bin = spark.read.format("binaryFile").load(path)
      .select(input_file_name().as("origin"), col("content"))
    // schema probe: header row of the first file (driver-side, one file)
    val first = bin.select("content").head().getAs[Array[Byte]](0)
    val firstRows = parseWorkbook(first, sheet)
    val header = firstRows.headOption.getOrElse(
      throw new IllegalArgumentException(s"no rows in first workbook at $path"))
    val nCols = header.length
    val schema = StructType(
      StructField("origin", StringType, nullable = false) +:
      header.map(h => StructField(h, StringType, nullable = true)))
    val sheetLocal = sheet
    val rowRdd = bin.select("origin", "content").rdd.flatMap { r =>
      val origin = r.getString(0)
      val rows = parseWorkbook(r.getAs[Array[Byte]](1), sheetLocal)
      // every workbook re-states the header; drop it (reference semantics)
      rows.drop(1).map { cells =>
        val padded = cells.padTo(nCols, null).take(nCols)
        Row.fromSeq(origin +: padded)
      }
    }
    val df = spark.createDataFrame(rowRdd, schema)
    if (stringify) df
    else graft.operators.AnyColumns.resolve(df,
      df.columns.filterNot(_ == "origin").toSeq)
  }

  /** Parse one workbook's bytes → rows of the selected sheet(s), cells as
    * strings (shared-string and inline-string resolved, numerics raw). */
  def parseWorkbook(bytes: Array[Byte], sheet: String): Seq[Seq[String]] = {
    val parts = readZip(bytes)
    val shared = parts.get("xl/sharedStrings.xml").map(parseSharedStrings)
      .getOrElse(Vector.empty)
    val sheetTargets: Seq[String] =
      if (sheet == "*")
        parts.keys.filter(_.matches("xl/worksheets/sheet\\d+\\.xml")).toSeq.sorted
      else {
        val idx = sheetIndex(parts, sheet).getOrElse(
          throw new IllegalArgumentException(s"sheet '$sheet' not found"))
        Seq(s"xl/worksheets/sheet${idx + 1}.xml")
      }
    sheetTargets.flatMap { t =>
      parts.get(t).map(b => parseSheet(b, shared)).getOrElse(Nil)
    }
  }

  private def readZip(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = scala.collection.mutable.Map[String, Array[Byte]]()
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out(e.getName) = zin.readAllBytes()
      e = zin.getNextEntry
    }
    out.toMap
  }

  private def sheetIndex(parts: Map[String, Array[Byte]], name: String): Option[Int] = {
    parts.get("xl/workbook.xml").flatMap { wb =>
      val rdr = XMLInputFactory.newInstance()
        .createXMLStreamReader(new ByteArrayInputStream(wb))
      var i = 0
      var found: Option[Int] = None
      while (rdr.hasNext && found.isEmpty) {
        if (rdr.next() == XMLStreamConstants.START_ELEMENT &&
            rdr.getLocalName == "sheet") {
          if (Option(rdr.getAttributeValue(null, "name")).contains(name))
            found = Some(i)
          i += 1
        }
      }
      found
    }
  }

  private def parseSharedStrings(bytes: Array[Byte]): Vector[String] = {
    val rdr = XMLInputFactory.newInstance()
      .createXMLStreamReader(new ByteArrayInputStream(bytes))
    val out = Vector.newBuilder[String]
    var current: StringBuilder = null
    var inT = false
    while (rdr.hasNext) {
      rdr.next() match {
        case XMLStreamConstants.START_ELEMENT if rdr.getLocalName == "si" =>
          current = new StringBuilder
        case XMLStreamConstants.START_ELEMENT if rdr.getLocalName == "t" =>
          inT = true
        case XMLStreamConstants.CHARACTERS if inT && current != null =>
          current.append(rdr.getText)
        case XMLStreamConstants.END_ELEMENT if rdr.getLocalName == "t" =>
          inT = false
        case XMLStreamConstants.END_ELEMENT if rdr.getLocalName == "si" =>
          out += current.toString; current = null
        case _ =>
      }
    }
    out.result()
  }

  /** Column letter(s) of an A1-style ref → 0-based index. */
  private def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i) - 'A' + 1); i += 1
    }
    acc - 1
  }

  private def parseSheet(bytes: Array[Byte], shared: Vector[String]): Seq[Seq[String]] = {
    val rdr = XMLInputFactory.newInstance()
      .createXMLStreamReader(new ByteArrayInputStream(bytes))
    val rows = Seq.newBuilder[Seq[String]]
    var row: scala.collection.mutable.ArrayBuffer[(Int, String)] = null
    var cellCol = -1
    var cellType = ""
    var text: StringBuilder = null
    var capture = false
    while (rdr.hasNext) {
      rdr.next() match {
        case XMLStreamConstants.START_ELEMENT => rdr.getLocalName match {
          case "row" => row = scala.collection.mutable.ArrayBuffer()
          case "c" =>
            cellCol = Option(rdr.getAttributeValue(null, "r"))
              .map(colIndex).getOrElse(if (row == null) 0 else row.size)
            cellType = Option(rdr.getAttributeValue(null, "t")).getOrElse("")
          case "v" | "t" => capture = true; text = new StringBuilder
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS if capture =>
          text.append(rdr.getText)
        case XMLStreamConstants.END_ELEMENT => rdr.getLocalName match {
          case "v" | "t" =>
            capture = false
            if (row != null && cellCol >= 0) {
              val raw = text.toString
              val value = cellType match {
                case "s" => shared.lift(raw.trim.toInt).getOrElse(raw)
                case _ => raw
              }
              row += cellCol -> value
            }
          case "c" => cellCol = -1
          case "row" =>
            if (row != null && row.nonEmpty) {
              val width = row.map(_._1).max + 1
              val arr = Array.fill[String](width)(null)
              row.foreach { case (i, v) => arr(i) = v }
              rows += arr.toSeq
            }
            row = null
          case _ =>
        }
        case _ =>
      }
    }
    rows.result()
  }
}
