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
    val header = parseWorkbookSheets(first, sheet)
      .flatMap(_.headOption).headOption.getOrElse(
        throw new IllegalArgumentException(s"no rows in first workbook at $path"))
    val nCols = header.length
    val schema = StructType(
      StructField("origin", StringType, nullable = false) +:
      header.map(h => StructField(h, StringType, nullable = true)))
    val sheetLocal = sheet
    val headerLocal: Seq[String] = header
    val rowRdd = bin.select("origin", "content").rdd.flatMap { r =>
      val origin = r.getString(0)
      val sheets = parseWorkbookSheets(r.getAs[Array[Byte]](1), sheetLocal)
      // every SHEET re-states the header; drop the first row of each sheet,
      // not just the first sheet's (multi-sheet "*" reads). A glob that
      // mixes workbooks with DIFFERENT headers would silently position-
      // align unrelated columns — fail loudly instead (schema drift is a
      // restart-the-pipeline event, SURVEY §7.4.2).
      sheets.flatMap { rows =>
        rows.headOption.foreach { h =>
          if (h != headerLocal) throw new IllegalStateException(
            s"xlsx schema drift in $origin: sheet header [${h.mkString(",")}] " +
            s"does not match the probed header [${headerLocal.mkString(",")}]")
        }
        rows.drop(1)
      }.map { cells =>
        val padded = cells.padTo(nCols, null).take(nCols)
        Row.fromSeq(origin +: padded)
      }
    }
    val df = spark.createDataFrame(rowRdd, schema)
    if (stringify) df
    else graft.operators.AnyColumns.resolve(df,
      df.columns.filterNot(_ == "origin").toSeq)
  }

  /** Parse one workbook's bytes → rows of the selected sheet(s) concatenated,
    * cells as strings (shared/inline strings resolved, numerics raw). */
  def parseWorkbook(bytes: Array[Byte], sheet: String): Seq[Seq[String]] =
    parseWorkbookSheets(bytes, sheet).flatten

  /** Format dispatch (reference parity anchor: calamine's
    * `open_workbook_auto`, `sections/excel_connector/src/source.rs:325`,
    * auto-detects the container): zip magic → OOXML .xlsx (parsed here);
    * CFB magic (D0 CF 11 E0 A1 B1 1A E1) → legacy BIFF8 .xls, handled by
    * [[BiffXls]]; anything else fails with the formats named — never a
    * fall-through empty read that looks like an empty workbook. */
  private def requireXlsx(bytes: Array[Byte]): Unit = {
    val isZip = bytes.length >= 4 &&
      bytes(0) == 0x50.toByte && bytes(1) == 0x4b.toByte &&
      (bytes(2) == 0x03.toByte || bytes(2) == 0x05.toByte || bytes(2) == 0x07.toByte)
    if (!isZip) throw new IllegalArgumentException(
      "workbook is neither OOXML .xlsx (zip) nor legacy .xls (CFB): " +
      "unknown container format")
  }

  /** Same, but one row-group per sheet so callers can drop headers per sheet. */
  def parseWorkbookSheets(bytes: Array[Byte], sheet: String): Seq[Seq[Seq[String]]] = {
    if (BiffXls.isCfb(bytes)) return BiffXls.parseWorkbookSheets(bytes, sheet)
    requireXlsx(bytes)
    val parts = readZip(bytes)
    val shared = parts.get("xl/sharedStrings.xml").map(parseSharedStrings)
      .getOrElse(Vector.empty)
    val entries = sheetEntries(parts)
    val sheetTargets: Seq[String] =
      if (sheet == "*") {
        if (entries.nonEmpty)
          entries.flatMap { case (name, _) => resolveSheetPart(parts, name) }
        else // no workbook.xml: fall back to part enumeration
          parts.keys.filter(_.matches("xl/worksheets/sheet\\d+\\.xml")).toSeq.sorted
      } else
        Seq(resolveSheetPart(parts, sheet).getOrElse(
          throw new IllegalArgumentException(s"sheet '$sheet' not found")))
    sheetTargets.map { t =>
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

  /** `<sheet>` entries of workbook.xml in workbook order: (name, r:id). */
  private def sheetEntries(parts: Map[String, Array[Byte]]): Seq[(String, Option[String])] =
    parts.get("xl/workbook.xml").map { wb =>
      val rdr = XMLInputFactory.newInstance()
        .createXMLStreamReader(new ByteArrayInputStream(wb))
      val out = Seq.newBuilder[(String, Option[String])]
      while (rdr.hasNext) {
        if (rdr.next() == XMLStreamConstants.START_ELEMENT &&
            rdr.getLocalName == "sheet") {
          val name = Option(rdr.getAttributeValue(null, "name")).getOrElse("")
          // r:id lives in the relationships namespace; scan attrs by local name
          val rid = (0 until rdr.getAttributeCount)
            .find(i => rdr.getAttributeLocalName(i) == "id")
            .map(rdr.getAttributeValue)
          out += name -> rid
        }
      }
      out.result()
    }.getOrElse(Nil)

  /** rId → normalized zip part name, from xl/_rels/workbook.xml.rels. */
  private def relTargets(parts: Map[String, Array[Byte]]): Map[String, String] =
    parts.get("xl/_rels/workbook.xml.rels").map { rels =>
      val rdr = XMLInputFactory.newInstance()
        .createXMLStreamReader(new ByteArrayInputStream(rels))
      val out = Map.newBuilder[String, String]
      while (rdr.hasNext) {
        if (rdr.next() == XMLStreamConstants.START_ELEMENT &&
            rdr.getLocalName == "Relationship") {
          val id = Option(rdr.getAttributeValue(null, "Id"))
          val target = Option(rdr.getAttributeValue(null, "Target"))
          for (i <- id; t <- target) {
            // targets are relative to xl/ unless absolute ("/xl/...")
            val norm = if (t.startsWith("/")) t.stripPrefix("/") else s"xl/$t"
            out += i -> norm
          }
        }
      }
      out.result()
    }.getOrElse(Map.empty)

  /** Resolve a sheet NAME to its worksheet part. The real mapping goes
    * workbook.xml `<sheet r:id>` → workbook.xml.rels Target — positional
    * sheetN.xml numbering is wrong for workbooks with deleted/reordered
    * sheets. Falls back to position only when the rels part is absent. */
  private def resolveSheetPart(parts: Map[String, Array[Byte]], name: String): Option[String] = {
    val entries = sheetEntries(parts)
    val idx = entries.indexWhere(_._1 == name)
    if (idx < 0) None
    else {
      val viaRels = entries(idx)._2.flatMap(relTargets(parts).get)
      viaRels.orElse(Some(s"xl/worksheets/sheet${idx + 1}.xml"))
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
