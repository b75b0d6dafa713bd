package graft.sources

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_16LE}

/** Legacy BIFF8 `.xls` reader in pure JVM — the other half of the Excel
  * surface (reference parity anchor: calamine's `open_workbook_auto`
  * reads xls alongside xlsx, `sections/excel_connector/src/source.rs:325`).
  * Two independent public formats are parsed here:
  *
  *  - the OLE2/CFB compound-file CONTAINER ([MS-CFB]): 512-byte header,
  *    sector FAT with DIFAT spill, directory entries, and the
  *    mini-stream/mini-FAT layer for streams under the 4096-byte cutoff
  *    (small workbooks live there — skipping it would silently read
  *    garbage for exactly the files a test writes);
  *  - the BIFF8 `Workbook` STREAM ([MS-XLS]): `(id: u16, len: u16,
  *    payload)` records — workbook globals (BOF, BOUNDSHEET offsets,
  *    shared-string table) followed by one substream per sheet
  *    (LABELSST/NUMBER/RK/MULRK/LABEL/BOOLERR/FORMULA+STRING cell
  *    records up to EOF).
  *
  * Output contract matches [[ExcelSource]]'s xlsx parse exactly: rows of
  * string cells per sheet, numerics rendered raw (integral values
  * without a decimal point, like xlsx's `<v>` text), booleans as "1"/"0"
  * (xlsx's raw `t="b"` form), error cells as absent. An SST that spills
  * into CONTINUE records — every workbook past ~8 KB of shared strings
  * does — is parsed across the fragments, including the spec's nastiest
  * rule: a split INSIDE a string's character data re-states the encoding
  * flag at the continuation start, so one string can switch between
  * compressed and UTF-16 halves mid-word ([MS-XLS] 2.5.293's
  * fHighByte-per-fragment).
  *
  * BIFF5/7 (Excel 5.0/95, the pre-Unicode generation) is read too: same
  * record stream, but strings are CODEPAGE-encoded byte strings with a
  * 16-bit length and no option flags (cells carry them INLINE in
  * LABEL/RSTRING records — BIFF5 has no SST), and BOUNDSHEET names are
  * 8-bit. The workbook's CODEPAGE record picks the charset (1252 and
  * friends map to the JDK's windows-125x codecs); absent one, cp1252 —
  * what every western Excel 95 wrote. Anything older than BIFF5 still
  * fails loudly with the version named.
  */
object BiffXls {

  def isCfb(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 &&
      (bytes(0) & 0xff) == 0xd0 && (bytes(1) & 0xff) == 0xcf &&
      (bytes(2) & 0xff) == 0x11 && (bytes(3) & 0xff) == 0xe0 &&
      (bytes(4) & 0xff) == 0xa1 && (bytes(5) & 0xff) == 0xb1 &&
      (bytes(6) & 0xff) == 0x1a && (bytes(7) & 0xff) == 0xe1

  /** Same shape as [[ExcelSource.parseWorkbookSheets]]: one row-group per
    * selected sheet, in workbook order. */
  def parseWorkbookSheets(bytes: Array[Byte], sheet: String): Seq[Seq[Seq[String]]] = {
    val stream = cfbStream(bytes, Seq("Workbook", "Book")).getOrElse(
      throw new IllegalArgumentException(
        "CFB container has no Workbook/Book stream — not an Excel .xls"))
    val g = globals(stream)
    val chosen =
      if (sheet == "*") g.sheets
      else g.sheets.filter(_._1 == sheet) match {
        case Nil => throw new IllegalArgumentException(s"sheet '$sheet' not found")
        case s => s
      }
    chosen.map { case (_, pos) => sheetRows(stream, pos, g) }
  }

  // ---------- CFB container ----------

  private val FreeSect = 0xFFFFFFFF
  private val EndOfChain = 0xFFFFFFFE

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
    ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Extract the first stream among `names` from a CFB container. */
  private def cfbStream(bytes: Array[Byte],
                        names: Seq[String]): Option[Array[Byte]] = {
    require(isCfb(bytes), "not a CFB container")
    val sectorSize = 1 << u16(bytes, 30)
    val miniSize = 1 << u16(bytes, 32)
    val miniCutoff = i32(bytes, 56)
    def sector(n: Int): Array[Byte] = {
      // [MS-CFB]: sector n starts at (n+1) << sectorShift — the header
      // occupies one full sector SLOT (512 real bytes, zero-padded to
      // 4096 in version-4 files), so hardcoding 512 here would read
      // version-4 containers 3584 bytes off
      val off = (n + 1).toLong * sectorSize
      require(off + sectorSize <= bytes.length, s"sector $n out of bounds")
      bytes.slice(off.toInt, off.toInt + sectorSize)
    }
    // DIFAT: 109 header entries + spill chain of DIFAT sectors
    val difat = Array.newBuilder[Int]
    (0 until 109).foreach(i => difat += i32(bytes, 76 + 4 * i))
    var difatSect = i32(bytes, 68)
    var guard = 0
    while (difatSect != EndOfChain && difatSect != FreeSect && guard < 65536) {
      val s = sector(difatSect)
      (0 until sectorSize / 4 - 1).foreach(i => difat += i32(s, 4 * i))
      difatSect = i32(s, sectorSize - 4)
      guard += 1
    }
    val fat: Array[Int] = difat.result().filter(_ != FreeSect)
      .flatMap(fs => { val s = sector(fs); (0 until sectorSize / 4).map(i => i32(s, 4 * i)) })
    def chain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var cur = start
      var hops = 0
      while (cur != EndOfChain && cur != FreeSect && out.size < size && hops <= fat.length) {
        out.write(sector(cur))
        cur = fat(cur)
        hops += 1
      }
      require(hops <= fat.length, "FAT chain loop")
      out.toByteArray.take(math.min(size, Int.MaxValue).toInt)
    }
    // directory entries: 128 bytes each, chained from header
    val dirBytes = chain(i32(bytes, 48), Long.MaxValue >> 1)
    final case class Entry(name: String, typ: Int, start: Int, size: Long)
    val entries = (0 until dirBytes.length / 128).map { i =>
      val o = i * 128
      val nameLen = u16(dirBytes, o + 64) // bytes incl. trailing null
      val name = if (nameLen >= 2)
        new String(dirBytes, o, nameLen - 2, UTF_16LE) else ""
      Entry(name, dirBytes(o + 66) & 0xff, i32(dirBytes, o + 116),
        (i32(dirBytes, o + 120) & 0xFFFFFFFFL))
    }
    val root = entries.find(_.typ == 5).getOrElse(
      throw new IllegalArgumentException("CFB container has no root entry"))
    lazy val miniStream = chain(root.start, root.size)
    lazy val miniFat: Array[Int] = {
      val mf = chain(i32(bytes, 60), Long.MaxValue >> 1)
      (0 until mf.length / 4).map(i => i32(mf, 4 * i)).toArray
    }
    def miniChain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var cur = start
      var hops = 0
      while (cur != EndOfChain && cur != FreeSect && out.size < size &&
             hops <= miniFat.length) {
        out.write(miniStream, cur * miniSize,
          math.min(miniSize, miniStream.length - cur * miniSize))
        cur = miniFat(cur)
        hops += 1
      }
      require(hops <= miniFat.length, "mini-FAT chain loop")
      out.toByteArray.take(size.toInt)
    }
    entries.find(e => e.typ == 2 && names.contains(e.name)).map { e =>
      if (e.size < miniCutoff) miniChain(e.start, e.size)
      else chain(e.start, e.size)
    }
  }

  // ---------- BIFF8 records ----------

  private final case class Rec(id: Int, at: Int, data: Array[Byte])

  private def recordsFrom(stream: Array[Byte], start: Int): Iterator[Rec] =
    new Iterator[Rec] {
      private var p = start
      def hasNext: Boolean = p + 4 <= stream.length
      def next(): Rec = {
        val id = u16(stream, p); val len = u16(stream, p + 2)
        val r = Rec(id, p, stream.slice(p + 4, p + 4 + len))
        p += 4 + len
        r
      }
    }

  /** Workbook globals: sheet (name, substream offset) list in workbook
    * order, the shared-string table (BIFF8), and — for BIFF5's byte
    * strings — the charset the CODEPAGE record picked. */
  private final case class Globals(sheets: Seq[(String, Int)],
                                   sst: Vector[String],
                                   biff5: Boolean,
                                   charset: java.nio.charset.Charset)

  /** [MS-OSHARED] code-page id → JDK charset. The western/CJK pages every
    * real Excel 5/95 workbook uses are all JDK-bundled; an exotic one
    * falls back to cp1252 rather than failing a whole read over label
    * bytes. */
  private def codepageCharset(cp: Int): java.nio.charset.Charset = {
    val name = cp match {
      case 367 => "US-ASCII"
      case 10000 => "x-MacRoman"
      case 932 => "windows-31j"
      case 936 => "GBK"
      case 949 => "x-windows-949"
      case 950 => "x-windows-950"
      case n if n >= 1250 && n <= 1258 => s"windows-$n"
      case n if n >= 28591 && n <= 28605 => s"ISO-8859-${n - 28590}"
      case _ => "windows-1252"
    }
    try java.nio.charset.Charset.forName(name)
    catch { case _: Exception =>
      java.nio.charset.Charset.forName("windows-1252") }
  }

  private def globals(stream: Array[Byte]): Globals = {
    val it = recordsFrom(stream, 0)
    require(it.hasNext, "empty Workbook stream")
    val bof = it.next()
    require(bof.id == 0x0809, f"stream does not start with BOF (got 0x${bof.id}%04x)")
    val vers = u16(bof.data, 0)
    // 0x0500 covers both BIFF5 (Excel 5.0) and BIFF7 (95) — the formats
    // are record-identical for everything this reader touches
    require(vers == 0x0600 || vers == 0x0500,
      f"BIFF version 0x$vers%04x is neither BIFF8 nor BIFF5/7 " +
      "(pre-Excel-5.0 workbooks are not supported — re-save as .xls or .xlsx)")
    val biff5 = vers == 0x0500
    var charset = codepageCharset(1252)
    val sheets = Seq.newBuilder[(String, Int)]
    // the SST record plus any CONTINUE records IMMEDIATELY following it
    // ([MS-XLS] 2.4.265: the spill fragments are adjacent; a CONTINUE
    // after any other record belongs to that record, not the SST)
    var sstFrags = Vector.empty[Array[Byte]]
    var sstOpen = false
    var depth = 1
    while (it.hasNext && depth > 0) {
      val r = it.next()
      r.id match {
        case 0x0809 => depth += 1; sstOpen = false // nested BOF
        case 0x000A => depth -= 1; sstOpen = false // EOF ends globals
        case 0x0042 => // CODEPAGE
          sstOpen = false
          // 1200 = "UTF-16" marker some BIFF8 writers emit; only byte
          // strings consult the charset, so ignore it there
          val cp = u16(r.data, 0)
          if (cp != 1200) charset = codepageCharset(cp)
        case 0x0085 => // BOUNDSHEET
          sstOpen = false
          val pos = i32(r.data, 0)
          val name = if (biff5) {
            // BIFF5: cch byte then ANSI bytes, no option flags
            val cch = r.data(6) & 0xff
            new String(r.data, 7, cch, charset)
          } else {
            val cch = r.data(6) & 0xff
            val flags = r.data(7) & 0xff
            if ((flags & 1) != 0) new String(r.data, 8, cch * 2, UTF_16LE)
            else new String(r.data, 8, cch, ISO_8859_1)
          }
          sheets += name -> pos
        case 0x00FC => sstFrags = Vector(r.data); sstOpen = true
        case 0x003C if sstOpen => sstFrags :+= r.data
        case _ => sstOpen = false
      }
    }
    val sst = if (sstFrags.isEmpty) Vector.empty[String] else parseSst(sstFrags)
    Globals(sheets.result(), sst, biff5, charset)
  }

  /** SST: `u32 total, u32 unique`, then `unique` XLUnicodeStrings spread
    * over the SST record and its CONTINUE fragments. Fragment rules
    * ([MS-XLS] 2.5.293): a split BETWEEN strings just resumes with the
    * next string's header at the continuation start; a split INSIDE a
    * string's character data inserts a fresh option-flags byte first —
    * the remaining characters may switch width — while splits inside the
    * trailing rich-run/ext payloads continue raw. Excel never splits the
    * fixed header fields themselves; if some other producer does, this
    * fails loudly rather than mis-reading. */
  private def parseSst(frags: Seq[Array[Byte]]): Vector[String] = {
    val unique = i32(frags.head, 4)
    val out = Vector.newBuilder[String]
    var fi = 0
    var p = 8
    def frag: Array[Byte] = frags(fi)
    def rem: Int = frag.length - p
    // between structures only: step over exhausted fragments, no flag byte
    def skipExhausted(): Unit =
      while (rem == 0 && fi + 1 < frags.length) { fi += 1; p = 0 }
    var i = 0
    while (i < unique) {
      skipExhausted()
      require(rem >= 3, s"SST truncated or header split across CONTINUE " +
        s"at string ${i + 1} of $unique — not a layout Excel produces")
      val cch = u16(frag, p); p += 2
      val flags = frag(p) & 0xff; p += 1
      val ext = (flags & 0x04) != 0
      val rich = (flags & 0x08) != 0
      val cRun = if (rich) {
        skipExhausted(); require(rem >= 2, "SST: run count split")
        val r = u16(frag, p); p += 2; r
      } else 0
      val cbExt = if (ext) {
        skipExhausted(); require(rem >= 4, "SST: ext size split")
        val e = i32(frag, p); p += 4; e
      } else 0
      val sb = new java.lang.StringBuilder(cch)
      var wide = (flags & 0x01) != 0
      var left = cch
      while (left > 0) {
        if (rem == 0) {
          // mid-string continuation: first byte of the next fragment
          // RE-STATES the encoding for the remaining characters
          fi += 1
          require(fi < frags.length, s"SST truncated inside string ${i + 1}")
          p = 0
          wide = (frag(p) & 0x01) != 0; p += 1
        }
        val width = if (wide) 2 else 1
        val fit = math.min(left, rem / width)
        require(fit > 0, s"SST fragment cannot hold one character of string ${i + 1}")
        sb.append(new String(frag, p, fit * width, if (wide) UTF_16LE else ISO_8859_1))
        p += fit * width
        left -= fit
      }
      // rich runs and ext payload: skipped raw, fragments or not
      var skip = 4 * cRun + cbExt
      while (skip > 0) {
        if (rem == 0) {
          fi += 1
          require(fi < frags.length, s"SST truncated in rich/ext of string ${i + 1}")
          p = 0
        }
        val take = math.min(skip, rem)
        p += take; skip -= take
      }
      out += sb.toString
      i += 1
    }
    out.result()
  }

  /** XLUnicodeRichExtendedString: u16 cch, u8 flags (bit0 wide chars,
    * bit2 ext, bit3 rich), optional run/ext counts, chars, trailing
    * run/ext payloads. Returns (string, bytes consumed). */
  private def xlUnicodeString(d: Array[Byte], off: Int): (String, Int) = {
    val cch = u16(d, off)
    var p = off + 2
    val flags = d(p) & 0xff; p += 1
    val wide = (flags & 0x01) != 0
    val ext = (flags & 0x04) != 0
    val rich = (flags & 0x08) != 0
    val cRun = if (rich) { val r = u16(d, p); p += 2; r } else 0
    val cbExt = if (ext) { val e = i32(d, p); p += 4; e } else 0
    val s =
      if (wide) { val str = new String(d, p, cch * 2, UTF_16LE); p += cch * 2; str }
      else { val str = new String(d, p, cch, ISO_8859_1); p += cch; str }
    p += 4 * cRun + cbExt
    (s, p - off)
  }

  /** One sheet substream → rows of string cells (xlsx-parse parity). */
  private def sheetRows(stream: Array[Byte], pos: Int,
                        g: Globals): Seq[Seq[String]] = {
    val sst = g.sst
    val it = recordsFrom(stream, pos)
    require(it.hasNext, s"sheet substream offset $pos out of bounds")
    val bof = it.next()
    require(bof.id == 0x0809, "BOUNDSHEET offset does not point at a BOF")
    // inline-string cell payload: BIFF8 = XLUnicodeString at `off`;
    // BIFF5 = u16 cch + codepage bytes (XLAnsiString — no flags byte)
    def inlineStr(d: Array[Byte], off: Int): String =
      if (g.biff5) new String(d, off + 2, u16(d, off), g.charset)
      else xlUnicodeString(d, off)._1
    val cells = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
    var pendingString = false // FORMULA with a string result awaits STRING
    var pendingCell: (Int, Int) = (0, 0)
    var done = false
    while (it.hasNext && !done) {
      val r = it.next(); val d = r.data
      r.id match {
        case 0x000A => done = true // EOF
        case 0x00FD => // LABELSST (BIFF8 only — BIFF5 strings are inline)
          cells += ((u16(d, 0), u16(d, 2), sst(i32(d, 6))))
        case 0x0203 => // NUMBER
          cells += ((u16(d, 0), u16(d, 2), numStr(readDouble(d, 6))))
        case 0x027E => // RK
          cells += ((u16(d, 0), u16(d, 2), numStr(rkValue(i32(d, 6)))))
        case 0x00BD => // MULRK: rw, colFirst, (ixfe, rk)*, colLast
          val rw = u16(d, 0); val colFirst = u16(d, 2)
          val n = (d.length - 6) / 6
          (0 until n).foreach { k =>
            cells += ((rw, colFirst + k, numStr(rkValue(i32(d, 4 + 6 * k + 2)))))
          }
        case 0x0204 => // LABEL (inline string)
          cells += ((u16(d, 0), u16(d, 2), inlineStr(d, 6)))
        case 0x00D6 => // RSTRING (BIFF5's rich-text LABEL): string then
          // formatting runs we drop, like BIFF8's rich payloads
          cells += ((u16(d, 0), u16(d, 2), inlineStr(d, 6)))
        case 0x0205 => // BOOLERR
          val isErr = (d(7) & 0xff) != 0
          if (!isErr) cells += ((u16(d, 0), u16(d, 2),
            if ((d(6) & 0xff) != 0) "1" else "0")) // xlsx t="b" raw form
        case 0x0006 => // FORMULA: cached result, or a STRING record next
          val rw = u16(d, 0); val col = u16(d, 2)
          if ((d(12) & 0xff) == 0xff && (d(13) & 0xff) == 0xff)
            (d(6) & 0xff) match {
              case 0 => pendingString = true; pendingCell = (rw, col)
              case 1 => cells += ((rw, col, if ((d(8) & 0xff) != 0) "1" else "0"))
              case 3 => cells += ((rw, col, ""))
              case _ => () // error result: absent, like error cells
            }
          else cells += ((rw, col, numStr(readDouble(d, 6))))
        case 0x0207 if pendingString => // STRING: the formula's text result
          cells += ((pendingCell._1, pendingCell._2, inlineStr(d, 0)))
          pendingString = false
        case _ => ()
      }
    }
    cells.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, cs) =>
      val width = cs.map(_._2).max + 1
      val arr = Array.fill[String](width)(null)
      cs.foreach { case (_, c, v) => arr(c) = v }
      arr.toSeq
    }
  }

  /** RK-encoded number: bit0 = value was multiplied by 100, bit1 = the
    * top 30 bits are a signed int, else they are the high bits of an
    * IEEE double. */
  private def rkValue(rk: Int): Double = {
    val base =
      if ((rk & 0x02) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
    if ((rk & 0x01) != 0) base / 100.0 else base
  }

  private def readDouble(d: Array[Byte], off: Int): Double = {
    var bits = 0L
    (0 until 8).foreach(i => bits |= (d(off + i) & 0xffL) << (8 * i))
    java.lang.Double.longBitsToDouble(bits)
  }

  /** Render like xlsx's raw `<v>` text: integral values without a
    * trailing `.0`. */
  private def numStr(v: Double): String =
    if (v.isWhole && math.abs(v) < 1e15) v.toLong.toString else v.toString
}
