package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_16LE}

/** Builds REAL legacy .xls bytes for the BiffXls specs: a spec-conformant
  * OLE2/CFB container (FAT, directory, and — for sub-4096-byte workbook
  * streams — the mini-FAT/mini-stream layer) holding a BIFF8 `Workbook`
  * stream assembled record by record. Small workbooks exercise the mini
  * stream exactly like Excel would store them; a padded variant crosses
  * the 4096-byte cutoff to exercise the regular FAT path. */
object BiffFixture {

  private val End = 0xFFFFFFFE
  private val Free = 0xFFFFFFFF
  private val FatSect = 0xFFFFFFFD

  def u16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  def u32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  def rec(id: Int, payload: Array[Byte]): Array[Byte] =
    u16(id) ++ u16(payload.length) ++ payload

  /** XLUnicodeRichExtendedString, wide (UTF-16LE) form. */
  def xlStr(s: String): Array[Byte] =
    u16(s.length) ++ Array(1.toByte) ++ s.getBytes(UTF_16LE)

  def bof(docType: Int): Array[Byte] =
    rec(0x0809, u16(0x0600) ++ u16(docType) ++ Array.fill[Byte](12)(0))
  def eof: Array[Byte] = rec(0x000A, Array.empty)

  def labelSst(rw: Int, col: Int, isst: Int): Array[Byte] =
    rec(0x00FD, u16(rw) ++ u16(col) ++ u16(0) ++ u32(isst))
  def number(rw: Int, col: Int, v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    rec(0x0203, u16(rw) ++ u16(col) ++ u16(0) ++
      (0 until 8).map(i => ((bits >> (8 * i)) & 0xff).toByte).toArray)
  }
  def rk(rw: Int, col: Int, rkBits: Int): Array[Byte] =
    rec(0x027E, u16(rw) ++ u16(col) ++ u16(0) ++ u32(rkBits))
  def mulRk(rw: Int, colFirst: Int, rks: Seq[Int]): Array[Byte] =
    rec(0x00BD, u16(rw) ++ u16(colFirst) ++
      rks.flatMap(r => u16(0) ++ u32(r)).toArray ++
      u16(colFirst + rks.size - 1))
  def label(rw: Int, col: Int, s: String): Array[Byte] =
    rec(0x0204, u16(rw) ++ u16(col) ++ u16(0) ++ xlStr(s))
  def boolErr(rw: Int, col: Int, b: Boolean): Array[Byte] =
    rec(0x0205, u16(rw) ++ u16(col) ++ u16(0) ++
      Array((if (b) 1 else 0).toByte, 0.toByte))
  def formulaNum(rw: Int, col: Int, v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    rec(0x0006, u16(rw) ++ u16(col) ++ u16(0) ++
      (0 until 8).map(i => ((bits >> (8 * i)) & 0xff).toByte).toArray ++
      u16(0) ++ u32(0) ++ Array.empty[Byte]) // grbit, chn; no parsed expr
  }
  def formulaStr(rw: Int, col: Int): Array[Byte] =
    rec(0x0006, u16(rw) ++ u16(col) ++ u16(0) ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0xFF.toByte, 0xFF.toByte) ++
      u16(0) ++ u32(0))
  def stringRec(s: String): Array[Byte] = rec(0x0207, xlStr(s))

  def sst(strings: Seq[String]): Array[Byte] =
    rec(0x00FC, u32(strings.size) ++ u32(strings.size) ++
      strings.flatMap(xlStr).toArray)

  /** XLUnicodeRichExtendedString, compressed (ISO-8859-1) form. */
  def xlStrCompressed(s: String): Array[Byte] =
    u16(s.length) ++ Array(0.toByte) ++ s.getBytes(ISO_8859_1)

  /** An SST spilling into CONTINUE records, exercising every fragment
    * rule the reader must honor ([MS-XLS] 2.5.293): a string split
    * MID-CHARACTERS whose continuation re-states the encoding flag —
    * and SWITCHES it, wide first half / compressed second half — a
    * string split BETWEEN entries, and a plain in-fragment string.
    * Returns (record bytes, expected strings in isst order). */
  def sstWithContinue(): (Array[Byte], Seq[String]) = {
    val s0 = "alpha"; val s1 = "beta-continues"; val s2 = "gamma"; val s3 = "delta"
    // fragment 0 (the SST record): header + s0 whole + s1's header and
    // first 5 chars in WIDE encoding
    val frag0 = u32(4) ++ u32(4) ++ xlStr(s0) ++
      u16(s1.length) ++ Array(1.toByte) ++ s1.substring(0, 5).getBytes(UTF_16LE)
    // fragment 1 (CONTINUE): re-stated flag byte = COMPRESSED for the
    // rest of s1, then s2 complete
    val frag1 = Array(0.toByte) ++ s1.substring(5).getBytes(ISO_8859_1) ++
      xlStrCompressed(s2)
    // fragment 2 (CONTINUE): split BETWEEN strings — s3 starts with its
    // own header, no flag byte
    val frag2 = xlStr(s3)
    (rec(0x00FC, frag0) ++ rec(0x003C, frag1) ++ rec(0x003C, frag2),
      Seq(s0, s1, s2, s3))
  }

  private def boundSheet(pos: Int, name: String): Array[Byte] =
    rec(0x0085, u32(pos) ++ u16(0) ++
      Array(name.length.toByte, 0.toByte) ++ name.getBytes(ISO_8859_1))

  /** Assemble a BIFF8 Workbook stream: globals (BOF, BOUNDSHEETs, SST,
    * EOF) then each sheet's substream; BOUNDSHEET offsets patched in a
    * second pass. `padGlobals` inserts an unknown record to push the
    * stream over the CFB mini-stream cutoff. */
  def workbookStream(sharedStrings: Seq[String],
                     sheets: Seq[(String, Array[Byte])],
                     padGlobals: Int = 0,
                     sstOverride: Option[Array[Byte]] = None): Array[Byte] = {
    def globalsOf(positions: Seq[Int]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write(bof(0x0005))
      if (padGlobals > 0) out.write(rec(0x08FF, Array.fill[Byte](padGlobals)(0)))
      sheets.zip(positions).foreach { case ((name, _), pos) =>
        out.write(boundSheet(pos, name)) }
      out.write(sstOverride.getOrElse(sst(sharedStrings)))
      out.write(eof)
      out.toByteArray
    }
    val globalsLen = globalsOf(sheets.map(_ => 0)).length
    val positions = sheets.map(_._2).scanLeft(globalsLen)(_ + _.length).init
    val out = new ByteArrayOutputStream()
    out.write(globalsOf(positions))
    sheets.foreach { case (_, body) => out.write(body) }
    out.toByteArray
  }

  /** Wrap a workbook stream in a CFB container. Streams under 4096 bytes
    * land in the mini stream (mini-FAT chained); larger ones chain
    * through the regular FAT. */
  def cfb(stream: Array[Byte], streamName: String = "Workbook"): Array[Byte] = {
    val sectorSize = 512
    def pad(b: Array[Byte], unit: Int): Array[Byte] =
      b ++ Array.fill[Byte]((unit - b.length % unit) % unit)(0)
    val mini = stream.length < 4096
    val fat = Array.fill(sectorSize / 4)(Free)
    val sectors = new ByteArrayOutputStream() // sectors 2.. (0=FAT, 1=dir)
    var firstMiniFat = End
    var numMiniFat = 0
    var rootStart = End
    var rootSize = 0
    var streamStart = 0
    if (mini) {
      // sector 2 = mini-FAT, sectors 3.. = mini stream (the root's stream)
      val miniBytes = pad(stream, 64)
      val nMini = miniBytes.length / 64
      val miniFat = Array.fill(sectorSize / 4)(Free)
      (0 until nMini - 1).foreach(i => miniFat(i) = i + 1)
      miniFat(nMini - 1) = End
      val miniFatBytes = miniFat.flatMap(u32)
      val miniSect = pad(miniBytes, sectorSize)
      val nMiniSect = miniSect.length / sectorSize
      fat(2) = End // mini-FAT chain: one sector
      (0 until nMiniSect - 1).foreach(i => fat(3 + i) = 4 + i)
      fat(3 + nMiniSect - 1) = End
      sectors.write(miniFatBytes)
      sectors.write(miniSect)
      firstMiniFat = 2; numMiniFat = 1
      rootStart = 3; rootSize = miniBytes.length
      streamStart = 0 // mini-sector 0
    } else {
      val data = pad(stream, sectorSize)
      val n = data.length / sectorSize
      (0 until n - 1).foreach(i => fat(2 + i) = 3 + i)
      fat(2 + n - 1) = End
      sectors.write(data)
      streamStart = 2
    }
    fat(0) = FatSect; fat(1) = End // FAT sector itself; single dir sector
    // directory: entry 0 = Root Entry (child -> 1), entry 1 = the stream
    def dirEntry(name: String, typ: Int, child: Int, start: Int,
                 size: Int): Array[Byte] = {
      val e = new Array[Byte](128)
      java.util.Arrays.fill(e, 0.toByte)
      val nb = name.getBytes(UTF_16LE)
      System.arraycopy(nb, 0, e, 0, nb.length)
      put16(e, 64, nb.length + 2)
      e(66) = typ.toByte; e(67) = 1
      put32(e, 68, -1); put32(e, 72, -1); put32(e, 76, child)
      put32(e, 116, start); put32(e, 120, size)
      e
    }
    val dir = pad(dirEntry("Root Entry", 5, 1, rootStart, rootSize) ++
      dirEntry(streamName, 2, -1, streamStart, stream.length), sectorSize)
    require(dir.length == sectorSize, "directory must fit one sector")
    // header
    val h = new Array[Byte](512)
    java.util.Arrays.fill(h, 0.toByte)
    Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1).zipWithIndex
      .foreach { case (v, i) => h(i) = v.toByte }
    put16(h, 24, 0x003E); put16(h, 26, 3); put16(h, 28, 0xFFFE)
    put16(h, 30, 9); put16(h, 32, 6)
    put32(h, 44, 1) // one FAT sector
    put32(h, 48, 1) // directory at sector 1
    put32(h, 56, 4096)
    put32(h, 60, firstMiniFat); put32(h, 64, numMiniFat)
    put32(h, 68, End); put32(h, 72, 0) // no DIFAT spill
    (0 until 109).foreach(i => put32(h, 76 + 4 * i, Free))
    put32(h, 76, 0) // DIFAT[0] = FAT sector 0
    h ++ fat.flatMap(u32) ++ dir ++ sectors.toByteArray
  }

  private def put16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
  }
  private def put32(b: Array[Byte], o: Int, v: Int): Unit =
    (0 until 4).foreach(i => b(o + i) = ((v >> (8 * i)) & 0xff).toByte)

  // ---------- BIFF5 (Excel 5.0/95) ----------

  /** XLAnsiString: u16 cch + codepage bytes, no option flags. */
  def ansiStr(s: String, cs: String = "windows-1252"): Array[Byte] =
    u16(s.length) ++ s.getBytes(java.nio.charset.Charset.forName(cs))

  def bof5(docType: Int): Array[Byte] =
    rec(0x0809, u16(0x0500) ++ u16(docType) ++ Array.fill[Byte](4)(0))
  def codepage(cp: Int): Array[Byte] = rec(0x0042, u16(cp))
  def label5(rw: Int, col: Int, s: String,
             cs: String = "windows-1252"): Array[Byte] =
    rec(0x0204, u16(rw) ++ u16(col) ++ u16(0) ++ ansiStr(s, cs))
  /** RSTRING: BIFF5's rich-text label — string then formatting runs
    * (count byte + 2-byte runs) the reader must step past. */
  def rstring5(rw: Int, col: Int, s: String, runs: Int = 2): Array[Byte] =
    rec(0x00D6, u16(rw) ++ u16(col) ++ u16(0) ++ ansiStr(s) ++
      Array(runs.toByte) ++ Array.fill[Byte](runs * 2)(3))
  def stringRec5(s: String): Array[Byte] = rec(0x0207, ansiStr(s))
  private def boundSheet5(pos: Int, name: String): Array[Byte] =
    rec(0x0085, u32(pos) ++ u16(0) ++
      Array(name.length.toByte) ++
      name.getBytes(java.nio.charset.Charset.forName("windows-1252")))

  /** Assemble a BIFF5 Book stream: globals (BOF v0x0500, CODEPAGE,
    * BOUNDSHEETs, EOF — no SST) then per-sheet substreams, offsets
    * patched in a second pass like the BIFF8 builder. */
  def workbookStream5(sheets: Seq[(String, Array[Byte])],
                      cp: Int = 1252): Array[Byte] = {
    def globalsOf(positions: Seq[Int]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write(bof5(0x0005))
      out.write(codepage(cp))
      sheets.zip(positions).foreach { case ((name, _), pos) =>
        out.write(boundSheet5(pos, name)) }
      out.write(eof)
      out.toByteArray
    }
    val globalsLen = globalsOf(sheets.map(_ => 0)).length
    val positions = sheets.map(_._2).scanLeft(globalsLen)(_ + _.length).init
    val out = new ByteArrayOutputStream()
    out.write(globalsOf(positions))
    sheets.foreach { case (_, body) => out.write(body) }
    out.toByteArray
  }

  /** Two-sheet Excel 5.0/95 fixture: inline ANSI labels (incl. a
    * cp1252 high-byte char and an RSTRING with runs to skip), the
    * shared numeric record kinds, and a string-formula pair — stored
    * in CFB under the BIFF5 stream name "Book". */
  def standardXls5(): Array[Byte] = {
    val sheet1 = {
      val out = new ByteArrayOutputStream()
      out.write(bof5(0x0010))
      out.write(label5(0, 0, "name")); out.write(label5(0, 1, "qty"))
      out.write(label5(0, 2, "price"))
      out.write(label5(1, 0, "ada")); out.write(number(1, 1, 3.0))
      out.write(rk(1, 2, 0x40040000)) // IEEE-form RK: 2.5
      out.write(rstring5(2, 0, "café")) // cp1252 0xE9 + rich runs
      out.write(mulRk(2, 1, Seq((7 << 2) | 0x02, (7 << 2) | 0x03))) // 7, 0.07
      out.write(eof)
      out.toByteArray
    }
    val sheet2 = {
      val out = new ByteArrayOutputStream()
      out.write(bof5(0x0010))
      out.write(label5(0, 0, "name")); out.write(label5(0, 1, "qty"))
      out.write(label5(1, 0, "grace")); out.write(formulaNum(1, 1, 42.0))
      out.write(boolErr(2, 1, b = false))
      out.write(formulaStr(2, 0)); out.write(stringRec5("hello"))
      out.write(eof)
      out.toByteArray
    }
    cfb(workbookStream5(Seq("Alpha" -> sheet1, "Beta" -> sheet2)),
      streamName = "Book")
  }

  /** The standard two-sheet fixture used across the specs: header row +
    * typed cells covering every record kind the reader handles. */
  def standardXls(padGlobals: Int = 0): Array[Byte] = {
    val shared = Seq("name", "qty", "price", "ada", "grace")
    val sheet1 = {
      val out = new ByteArrayOutputStream()
      out.write(bof(0x0010))
      out.write(labelSst(0, 0, 0)); out.write(labelSst(0, 1, 1))
      out.write(labelSst(0, 2, 2))
      out.write(labelSst(1, 0, 3)); out.write(number(1, 1, 3.0))
      out.write(rk(1, 2, 0x40040000)) // IEEE-form RK: 2.5
      out.write(label(2, 0, "bob"))
      out.write(mulRk(2, 1, Seq((7 << 2) | 0x02, (7 << 2) | 0x03))) // 7, 0.07
      out.write(eof)
      out.toByteArray
    }
    val sheet2 = {
      val out = new ByteArrayOutputStream()
      out.write(bof(0x0010))
      out.write(labelSst(0, 0, 0)); out.write(labelSst(0, 1, 1))
      out.write(labelSst(0, 2, 2))
      out.write(labelSst(1, 0, 4)); out.write(formulaNum(1, 1, 42.0))
      out.write(boolErr(1, 2, b = true))
      out.write(formulaStr(2, 0)); out.write(stringRec("hello"))
      out.write(eof)
      out.toByteArray
    }
    cfb(workbookStream(shared, Seq("Alpha" -> sheet1, "Beta" -> sheet2),
      padGlobals))
  }
}
