package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Real SQLite database-file reader (reference S1,
  * `sections/sqlite_connector/src/source.rs`) in pure JVM: parses the
  * SQLite file format directly — page header, sqlite_master, table
  * B-trees (interior + leaf), record serial types, overflow chains —
  * so a SQLite table can be ingested with no JDBC driver on the
  * classpath, the same "read the file where it lies" model as the rest of
  * the lake. Cells surface as strings (SQLite columns are dynamically
  * typed — the reference's `DataType::Any`); `stringify=false` recovers
  * typed columns via the [[graft.operators.AnyColumns]] LUB policy.
  *
  * Distribution: one parse task per database file through the binaryFile
  * source (a SQLite file is a single-writer artifact; the workbook-level
  * granularity is the correct unit, as with xlsx). Arbitrary SQL pushdown
  * (the reference's `query` config) still belongs to the JDBC path when a
  * driver is present; Spark-side filters/projections apply on top of this
  * scan either way.
  *
  * Format reference: sqlite.org/fileformat2.html (public documentation).
  */
object SqliteFile {

  def read(spark: SparkSession, path: String, table: String,
           stringify: Boolean = true): DataFrame = {
    // sibling -wal files carry commits not yet checkpointed into the main
    // file — the normal state of a LIVE database, which is exactly what
    // the reference watches (`sections/sqlite_connector/src/source.rs`
    // watches db + WAL mtime). Existence is probed through the Hadoop
    // FileSystem API (one driver-side RPC, works on any FS scheme) —
    // exception-message matching on a failed load is driver-version
    // dependent and was observed to break between Spark releases.
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val mainFiles = Option(fs.globStatus(hPath)).getOrElse(Array.empty)
      .filter(_.isFile)
    require(mainFiles.nonEmpty, s"no sqlite file matches $path")
    val walFiles = Option(fs.globStatus(
        new org.apache.hadoop.fs.Path(path + "-wal"))).getOrElse(Array.empty)
      .filter(_.isFile)
    // schema probe: ONE database's bytes read directly on the driver —
    // no Spark job, no cluster round-trip for what is a local decode of
    // sqlite_master (the probe db + its wal stream through fs.open)
    def slurp(p: org.apache.hadoop.fs.Path): Array[Byte] = {
      val in = fs.open(p)
      try in.readAllBytes() finally in.close()
    }
    val probeMain = mainFiles.head.getPath
    val probeWal = new org.apache.hadoop.fs.Path(probeMain.toString + "-wal")
    val first = applyWal(slurp(probeMain),
      if (fs.exists(probeWal)) Some(slurp(probeWal)) else None)
    val cols = tableColumns(first, table)
    val main = spark.read.format("binaryFile").load(path)
      .select(input_file_name().as("origin"), col("content"))
    // absent-wal is the common case: skip the second scan and the join
    // entirely instead of left-joining an empty frame
    val bin =
      if (walFiles.isEmpty)
        main.withColumn("wal", lit(null).cast(org.apache.spark.sql.types.BinaryType))
      else {
        val wal = spark.read.format("binaryFile").load(path + "-wal")
          .select(regexp_replace(input_file_name(), "-wal$", "").as("origin"),
            col("content").as("wal"))
        main.join(wal, Seq("origin"), "left")
      }
    val schema = StructType(
      StructField("origin", StringType, nullable = false) +:
      cols.map(c => StructField(c, StringType, nullable = true)))
    val nCols = cols.length
    val tableLocal = table
    val rowRdd = bin.select("origin", "content", "wal").rdd.flatMap { r =>
      val origin = r.getString(0)
      val eff = applyWal(r.getAs[Array[Byte]](1), Option(r.getAs[Array[Byte]](2)))
      readTable(eff, tableLocal).map { cells =>
        Row.fromSeq(origin +: cells.padTo(nCols, null).take(nCols))
      }
    }
    val df = spark.createDataFrame(rowRdd, schema)
    if (stringify) df
    else graft.operators.AnyColumns.resolve(df,
      df.columns.filterNot(_ == "origin").toSeq)
  }

  /** Overlay the COMMITTED frames of a write-ahead log onto the main file
    * bytes (sqlite.org/walformat.html): frames are validated against the
    * header salts and the cumulative checksum chain and applied only up to
    * the last commit frame — exactly SQLite's own recovery rule, so an
    * in-flight or torn transaction is never surfaced. Returns the main
    * bytes untouched when there is no (valid) WAL. */
  private[sources] def applyWal(main: Array[Byte], wal: Option[Array[Byte]]): Array[Byte] =
    wal match {
      case Some(w) if w.length >= 32 + 24 => overlay(main, w)
      case _ => main
    }

  private def overlay(main: Array[Byte], w: Array[Byte]): Array[Byte] = {
    def be32(o: Int): Long =
      ((w(o) & 0xffL) << 24) | ((w(o + 1) & 0xffL) << 16) |
      ((w(o + 2) & 0xffL) << 8) | (w(o + 3) & 0xffL)
    def le32(o: Int): Long =
      ((w(o + 3) & 0xffL) << 24) | ((w(o + 2) & 0xffL) << 16) |
      ((w(o + 1) & 0xffL) << 8) | (w(o) & 0xffL)
    val magic = be32(0)
    if (magic != 0x377f0682L && magic != 0x377f0683L) return main
    // magic low bit selects the WORD order the checksum is computed over;
    // stored checksum values are always big-endian
    val word: Int => Long = if (magic == 0x377f0683L) be32 else le32
    val pageSize = be32(8).toInt
    if (pageSize < 512 || pageSize > 65536) return main
    val salt1 = be32(16)
    val salt2 = be32(20)
    var s0 = 0L
    var s1 = 0L
    def cksum(off: Int, len: Int): Unit = {
      var i = off
      while (i < off + len) {
        s0 = (s0 + word(i) + s1) & 0xffffffffL
        s1 = (s1 + word(i + 4) + s0) & 0xffffffffL
        i += 8
      }
    }
    cksum(0, 24)
    if (be32(24) != s0 || be32(28) != s1) return main // corrupt header
    val frameSize = 24 + pageSize
    val pending = scala.collection.mutable.LinkedHashMap[Long, Array[Byte]]()
    val committed = scala.collection.mutable.LinkedHashMap[Long, Array[Byte]]()
    var dbPagesAfter = 0L
    var off = 32
    var ok = true
    while (ok && off + frameSize <= w.length) {
      val pageNo = be32(off)
      val commitPages = be32(off + 4)
      if (be32(off + 8) != salt1 || be32(off + 12) != salt2) ok = false // stale
      else {
        cksum(off, 8)
        cksum(off + 24, pageSize)
        if (be32(off + 16) != s0 || be32(off + 20) != s1) ok = false // torn
        else {
          pending.put(pageNo,
            java.util.Arrays.copyOfRange(w, off + 24, off + 24 + pageSize))
          if (commitPages != 0) {
            committed ++= pending
            pending.clear()
            dbPagesAfter = commitPages
          }
          off += frameSize
        }
      }
    }
    if (committed.isEmpty) main
    else {
      // SQLite recovery truncates the database to the LAST commit's size:
      // an earlier transaction may have grown pages a later one removed
      // (vacuum) — those frames must be dropped, not written past the end
      val mainPages = (main.length / pageSize).toLong
      val nPages = if (dbPagesAfter > 0) dbPagesAfter else mainPages
      val out = java.util.Arrays.copyOf(main, (nPages * pageSize).toInt)
      committed.foreach { case (p, data) =>
        if (p >= 1 && p <= nPages)
          System.arraycopy(data, 0, out, ((p - 1) * pageSize).toInt, pageSize)
      }
      out
    }
  }

  // ---------------------------------------------------------------- format

  private final case class Db(bytes: Array[Byte], pageSize: Int, usable: Int) {
    def page(n: Int): Int = (n - 1) * pageSize // offset of 1-based page
    def u8(o: Int): Int = bytes(o) & 0xff
    def u16(o: Int): Int = (u8(o) << 8) | u8(o + 1)
    def u32(o: Int): Long = (u16(o).toLong << 16) | u16(o + 2)
  }

  private def open(bytes: Array[Byte]): Db = {
    require(bytes.length > 100 &&
      new String(bytes, 0, 15, "ISO-8859-1") == "SQLite format 3",
      "not a SQLite database file")
    val raw = ((bytes(16) & 0xff) << 8) | (bytes(17) & 0xff)
    val pageSize = if (raw == 1) 65536 else raw
    val reserved = bytes(20) & 0xff
    Db(bytes, pageSize, pageSize - reserved)
  }

  /** (value, bytesRead) of a SQLite varint at `o`. */
  private def varint(db: Db, o: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val b = db.u8(o + i)
      v = (v << 7) | (b & 0x7f)
      if ((b & 0x80) == 0) return (v, i + 1)
      i += 1
    }
    ((v << 8) | db.u8(o + 8), 9)
  }

  /** Rows of `table` as decoded cell strings (null = SQL NULL). */
  def readTable(bytes: Array[Byte], table: String): Seq[Seq[String]] = {
    val db = open(bytes)
    val master = scanBtree(db, 1)
    val entry = master.map(r => r.values).find(v =>
      v.lift(0).flatten.contains("table") && v.lift(1).flatten.contains(table))
      .getOrElse(throw new IllegalArgumentException(s"table '$table' not found"))
    val rootPage = entry(3).get.toInt
    val sql = entry(4).get
    val ipkIndex = integerPrimaryKeyIndex(sql)
    scanBtree(db, rootPage).map { rec =>
      val cells = rec.values.map(_.orNull)
      // rowid-alias: the INTEGER PRIMARY KEY column is stored as NULL
      ipkIndex match {
        case Some(i) if i < cells.length && cells(i) == null =>
          cells.updated(i, rec.rowid.toString)
        case Some(i) if cells.length <= i =>
          (cells ++ Seq.fill(i - cells.length)(null)) :+ rec.rowid.toString
        case _ => cells
      }
    }
  }

  /** Column names of `table` parsed from its stored CREATE TABLE sql. */
  def tableColumns(bytes: Array[Byte], table: String): Seq[String] = {
    val db = open(bytes)
    val master = scanBtree(db, 1)
    val entry = master.map(_.values).find(v =>
      v.lift(0).flatten.contains("table") && v.lift(1).flatten.contains(table))
      .getOrElse(throw new IllegalArgumentException(s"table '$table' not found"))
    parseColumns(entry(4).get)
  }

  private final case class Record(rowid: Long, values: IndexedSeq[Option[String]])

  private def scanBtree(db: Db, rootPage: Int): Seq[Record] = {
    val out = Seq.newBuilder[Record]
    def walk(pageNo: Int): Unit = {
      val base = db.page(pageNo)
      val hdr = base + (if (pageNo == 1) 100 else 0)
      db.u8(hdr) match {
        case 0x05 => // interior table page
          val nCells = db.u16(hdr + 3)
          val ptrs = hdr + 12
          var i = 0
          while (i < nCells) {
            val cell = base + db.u16(ptrs + i * 2)
            walk(db.u32(cell).toInt)
            i += 1
          }
          walk(db.u32(hdr + 8).toInt) // right-most pointer
        case 0x0d => // leaf table page
          val nCells = db.u16(hdr + 3)
          val ptrs = hdr + 8
          var i = 0
          while (i < nCells) {
            val cell = base + db.u16(ptrs + i * 2)
            val (payloadLen, n1) = varint(db, cell)
            val (rowid, n2) = varint(db, cell + n1)
            val payload = readPayload(db, cell + n1 + n2, payloadLen)
            out += Record(rowid, decodeRecord(payload))
            i += 1
          }
        case other =>
          throw new IllegalStateException(f"unexpected b-tree page type 0x$other%02x")
      }
    }
    walk(rootPage)
    out.result()
  }

  /** Assemble a cell payload, following the overflow chain when spilled
    * (thresholds per fileformat2.html §B-tree Pages, table leaf case). */
  private def readPayload(db: Db, localStart: Int, payloadLen: Long): Array[Byte] = {
    val u = db.usable
    val x = u - 35
    if (payloadLen <= x) {
      java.util.Arrays.copyOfRange(db.bytes, localStart, localStart + payloadLen.toInt)
    } else {
      val m = ((u - 12) * 32) / 255 - 23
      val k = m + ((payloadLen - m) % (u - 4)).toInt
      val local = if (k <= x) k else m
      val out = new Array[Byte](payloadLen.toInt)
      System.arraycopy(db.bytes, localStart, out, 0, local)
      var filled = local
      var next = db.u32(localStart + local).toInt
      while (next != 0 && filled < payloadLen) {
        val po = db.page(next)
        val take = math.min(u - 4, payloadLen.toInt - filled)
        System.arraycopy(db.bytes, po + 4, out, filled, take)
        filled += take
        next = db.u32(po).toInt
      }
      out
    }
  }

  /** Decode a record payload → one Option[String] per column (dynamic
    * typing stringified: ints decimal, floats via Double.toString, blobs
    * lowercase hex — deterministic canonical forms). */
  private def decodeRecord(p: Array[Byte]): IndexedSeq[Option[String]] = {
    def v(o: Int): (Long, Int) = { // varint over the payload array
      var x = 0L
      var i = 0
      while (i < 8) {
        val b = p(o + i) & 0xff
        x = (x << 7) | (b & 0x7f)
        if ((b & 0x80) == 0) return (x, i + 1)
        i += 1
      }
      ((x << 8) | (p(o + 8) & 0xff), 9)
    }
    val (hdrLen, n0) = v(0)
    val types = IndexedSeq.newBuilder[Long]
    var o = n0
    while (o < hdrLen) {
      val (t, n) = v(o)
      types += t
      o += n
    }
    var body = hdrLen.toInt
    types.result().map { t =>
      def beInt(len: Int): Long = {
        var x = if ((p(body) & 0x80) != 0) -1L else 0L
        var i = 0
        while (i < len) { x = (x << 8) | (p(body + i) & 0xff); i += 1 }
        x
      }
      val (value, size): (Option[String], Int) = t match {
        case 0 => (None, 0)
        case 1 | 2 | 3 | 4 => (Some(beInt(t.toInt).toString), t.toInt)
        case 5 => (Some(beInt(6).toString), 6)
        case 6 => (Some(beInt(8).toString), 8)
        case 7 =>
          val bits = (0 until 8).foldLeft(0L)((a, i) => (a << 8) | (p(body + i) & 0xff))
          (Some(java.lang.Double.longBitsToDouble(bits).toString), 8)
        case 8 => (Some("0"), 0)
        case 9 => (Some("1"), 0)
        case n if n >= 12 && n % 2 == 0 =>
          val len = ((n - 12) / 2).toInt
          val hex = new StringBuilder(len * 2)
          (0 until len).foreach(i => hex.append(f"${p(body + i) & 0xff}%02x"))
          (Some(hex.toString), len)
        case n =>
          val len = ((n - 13) / 2).toInt
          (Some(new String(p, body, len, "UTF-8")), len)
      }
      body += size
      value
    }
  }

  /** Column list from a stored CREATE TABLE statement: names at paren
    * depth 0, table-level constraints skipped. */
  def parseColumns(sql: String): Seq[String] = {
    val open = sql.indexOf('(')
    require(open >= 0, s"no column list in: $sql")
    val inner = sql.substring(open + 1, sql.lastIndexOf(')'))
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0
    val cur = new StringBuilder
    inner.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => parts += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) parts += cur.toString
    val constraints = Set("primary", "unique", "check", "foreign", "constraint")
    parts.toSeq.map(_.trim).filter(_.nonEmpty)
      .filterNot(d => constraints.contains(
        d.split("[\\s(]+").head.toLowerCase))
      .map(_.split("\\s+").head.stripPrefix("\"").stripSuffix("\"")
        .stripPrefix("`").stripSuffix("`")
        .stripPrefix("[").stripSuffix("]"))
  }

  /** Index of the INTEGER PRIMARY KEY (rowid alias) column, if any. */
  def integerPrimaryKeyIndex(sql: String): Option[Int] = {
    val cols = parseColumnDefs(sql)
    cols.zipWithIndex.collectFirst {
      case (d, i) if d.toLowerCase.matches("(?s).*\\binteger\\b.*\\bprimary\\s+key\\b.*") => i
    }
  }

  private def parseColumnDefs(sql: String): Seq[String] = {
    val open = sql.indexOf('(')
    val inner = sql.substring(open + 1, sql.lastIndexOf(')'))
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0
    val cur = new StringBuilder
    inner.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => parts += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) parts += cur.toString
    val constraints = Set("primary", "unique", "check", "foreign", "constraint")
    parts.toSeq.map(_.trim).filter(_.nonEmpty)
      .filterNot(d => constraints.contains(d.split("[\\s(]+").head.toLowerCase))
  }
}
