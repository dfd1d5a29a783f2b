package graft.sources

import scala.collection.mutable

/** Self-contained legacy Excel (.xls, BIFF8 AND BIFF5/7) parsing — no POI,
  * no external jars. A .xls file is an OLE2/CFB compound document (MS-CFB)
  * whose "Workbook" (BIFF8) or "Book" (BIFF5/7, Excel 5/95) stream is a
  * sequence of BIFF records (MS-XLS). The subset a staging pipeline needs —
  * sheet catalog, shared strings, cell values, number-format-driven date
  * rendering, 1900/1904 date system — is parsed here with plain JDK byte
  * twiddling, mirroring [[Excel]]'s contract for the zip/XML (.xlsx)
  * container.
  *
  * BIFF5/7 differs from BIFF8 only in its string encoding for this record
  * subset: no SST/LABELSST (LABEL/RSTRING carry inline byte strings),
  * BOUNDSHEET names and FORMAT codes are 8-bit-length byte strings, and
  * all byte strings decode through the workbook's CODEPAGE record
  * (windows-1252 for every NHS-era file; the decoder honours whatever
  * codepage the record declares). Numeric records (NUMBER/RK/MULRK),
  * BOOLERR, FORMULA and the date machinery are byte-identical across
  * versions. The BOF version field (0x0500 vs 0x0600) selects the mode.
  *
  * Reference surface replaced: the extractors collect `.xls` alongside
  * `.xlsx` (scripts/supporting-facilities/extract_supporting_facilities_main.py:143-149,
  * scripts/critical-care-beds/extract_critical_care_beds_after_2010.py:140)
  * and `readxl::read_excel` reads both transparently
  * (scripts/overnight-beds/build_datasets_overnight_day_beds.R:49-59);
  * pre-~2013 NHS publications ship as .xls only.
  *
  * Values surface as raw strings (the staging contract, same as the CSV and
  * xlsx paths): numbers in canonical minimal form ("42", not "42.0"),
  * booleans "TRUE"/"FALSE", error cells null, date-styled serials rendered
  * via [[Excel.serialToDateString]].
  */
object Xls {

  /** Parsed workbook: worksheet names in BOUNDSHEET order with the stream
    * offset of each sheet's BOF, the full Workbook stream bytes, the shared
    * string table, XF-index → renders-as-date, and the date system.
    */
  final case class XlsWorkbook(sheets: Seq[(String, Int)],
                               stream: Array[Byte],
                               sst: IndexedSeq[String],
                               dateXfs: Set[Int],
                               date1904: Boolean,
                               biff5: Boolean = false,
                               charset: java.nio.charset.Charset =
                                 Xls.Windows1252) {
    def sheetNames: Seq[String] = sheets.map(_._1)

    /** First sheet whose name matches the regex, case-insensitively — the
      * same selection contract as [[Excel.Workbook.sheetByName]].
      */
    def sheetByName(nameRegex: String): Option[Int] = {
      val re = ("(?i)" + nameRegex).r
      val i = sheets.indexWhere { case (n, _) => re.findFirstIn(n).isDefined }
      if (i < 0) None else Some(i)
    }
  }

  // ---------------------------------------------------------------------
  // CFB (compound file) container — MS-CFB v3/v4
  // ---------------------------------------------------------------------

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def u16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def i32(b: Array[Byte], i: Int): Int =
    u16(b, i) | (u16(b, i + 2) << 16)

  private val EndOfChain = 0xFFFFFFFE
  private val FreeSect = 0xFFFFFFFF

  /** Extract a named stream from a CFB container. Handles multi-sector
    * FATs via the header DIFAT + DIFAT sector chains, multi-sector
    * directories, and small streams stored in the ministream via the
    * miniFAT (cutoff from the header, standard 4096).
    */
  private[sources] def cfbStream(file: Array[Byte], streamName: String): Array[Byte] = {
    require(file.length >= 512 &&
      i32(file, 0) == 0xE011CFD0 && i32(file, 4) == 0xE11AB1A1,
      "not an OLE2/CFB file (bad signature)")
    val sectorShift = u16(file, 30)
    val sectorSize = 1 << sectorShift
    val miniShift = u16(file, 32)
    val miniSize = 1 << miniShift
    val numFat = i32(file, 44)
    val firstDir = i32(file, 48)
    val miniCutoff = i32(file, 56)
    val firstMiniFat = i32(file, 60)
    val numMiniFat = i32(file, 64)
    val firstDifat = i32(file, 68)

    def sector(n: Int): Array[Byte] = {
      val off = (n + 1).toLong << sectorShift
      require(off + sectorSize <= file.length, s"sector $n beyond EOF")
      java.util.Arrays.copyOfRange(file, off.toInt, off.toInt + sectorSize)
    }

    // FAT sector list: 109 entries in the header, then DIFAT sector chain
    val fatSectors = mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < 109 && fatSectors.length < numFat) {
      val s = i32(file, 76 + 4 * i)
      if (s != FreeSect) fatSectors += s
      i += 1
    }
    var difat = firstDifat
    while (difat != EndOfChain && difat != FreeSect && fatSectors.length < numFat) {
      val d = sector(difat)
      val perSector = sectorSize / 4 - 1
      var j = 0
      while (j < perSector && fatSectors.length < numFat) {
        val s = i32(d, 4 * j)
        if (s != FreeSect) fatSectors += s
        j += 1
      }
      difat = i32(d, sectorSize - 4)
    }

    val fat: Array[Int] = fatSectors.toArray.flatMap { s =>
      val d = sector(s)
      Array.tabulate(sectorSize / 4)(k => i32(d, 4 * k))
    }

    def chain(start: Int): Seq[Int] = {
      val out = mutable.ArrayBuffer.empty[Int]
      var s = start
      var guard = 0
      while (s != EndOfChain && s != FreeSect && guard <= fat.length) {
        require(s >= 0 && s < fat.length, s"FAT chain leaves table at $s")
        out += s; s = fat(s); guard += 1
      }
      require(guard <= fat.length, "cyclic FAT chain")
      out.toSeq
    }

    def readChain(start: Int, size: Long): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream(size.toInt max 16)
      chain(start).foreach(s => buf.write(sector(s)))
      val all = buf.toByteArray
      java.util.Arrays.copyOf(all, math.min(size, all.length.toLong).toInt)
    }

    // directory entries (128 bytes each) across the directory chain
    final case class DirEntry(name: String, objType: Int, start: Int, size: Long)
    val dirBytes = {
      val buf = new java.io.ByteArrayOutputStream()
      chain(firstDir).foreach(s => buf.write(sector(s)))
      buf.toByteArray
    }
    val entries = (0 until dirBytes.length / 128).map { k =>
      val off = k * 128
      val nameLen = u16(dirBytes, off + 64) // bytes incl. terminating null
      val name = if (nameLen >= 2)
        new String(dirBytes, off, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
      else ""
      val size = (i32(dirBytes, off + 120).toLong & 0xFFFFFFFFL) |
        (if (sectorShift > 9) (i32(dirBytes, off + 124).toLong & 0xFFFFFFFFL) << 32 else 0L)
      DirEntry(name, u8(dirBytes, off + 66), i32(dirBytes, off + 116), size)
    }

    val root = entries.find(_.objType == 5)
      .getOrElse(throw new IllegalArgumentException("CFB: no root entry"))
    val target = entries.find(e => e.objType == 2 && e.name == streamName)
      .getOrElse(throw new IllegalArgumentException(
        s"CFB: no stream '$streamName' (have: ${entries.filter(_.objType == 2).map(_.name)})"))

    if (target.size >= miniCutoff) readChain(target.start, target.size)
    else {
      // small stream: mini sectors carved out of the ministream (root chain)
      val ministream = readChain(root.start, root.size)
      val miniFat: Array[Int] = {
        val buf = new java.io.ByteArrayOutputStream()
        var s = firstMiniFat
        var n = 0
        while (s != EndOfChain && s != FreeSect && n < numMiniFat) {
          buf.write(sector(s)); s = fat(s); n += 1
        }
        val d = buf.toByteArray
        Array.tabulate(d.length / 4)(k => i32(d, 4 * k))
      }
      val out = new java.io.ByteArrayOutputStream(target.size.toInt max 16)
      var s = target.start
      var guard = 0
      while (s != EndOfChain && s != FreeSect && guard <= miniFat.length) {
        require(s >= 0 && (s + 1) * miniSize <= ministream.length, s"mini sector $s out of range")
        out.write(ministream, s * miniSize, miniSize)
        s = miniFat(s); guard += 1
      }
      java.util.Arrays.copyOf(out.toByteArray, target.size.toInt)
    }
  }

  // ---------------------------------------------------------------------
  // BIFF8 records
  // ---------------------------------------------------------------------

  private val RecBofBiff8 = 0x0809 // BIFF5/7 share this BOF id; vers differs
  private val RecEof = 0x000A
  private val RecCodepage = 0x0042
  private val RecRString = 0x00D6
  private val RecContinue = 0x003C
  private val RecBoundsheet = 0x0085
  private val RecSst = 0x00FC
  private val RecDateMode = 0x0022
  private val RecFormat = 0x041E
  private val RecXf = 0x00E0
  private val RecNumber = 0x0203
  private val RecRk = 0x027E
  private val RecMulRk = 0x00BD
  private val RecLabelSst = 0x00FD
  private val RecLabel = 0x0204
  private val RecBoolErr = 0x0205
  private val RecFormula = 0x0006
  private val RecString = 0x0207

  /** Cursor over a run of record payloads (a record plus its CONTINUE
    * tail), with BIFF8 unicode-string reads that honour the format's one
    * quirk: character data split across a CONTINUE restarts with a fresh
    * compression-flag byte (MS-XLS 2.5.293).
    */
  private final class RecCursor(parts: IndexedSeq[Array[Byte]]) {
    private var p = 0 // part index
    private var o = 0 // offset within part

    def hasBytes: Boolean = {
      skipEmpty(); p < parts.length
    }
    private def skipEmpty(): Unit =
      while (p < parts.length && o >= parts(p).length) { p += 1; o = 0 }
    private def atBoundary: Boolean = { skipEmpty(); o == 0 && p > 0 }

    def readU8(): Int = { skipEmpty(); val v = u8(parts(p), o); o += 1; v }
    def readU16(): Int = readU8() | (readU8() << 8)
    def readU32(): Int = readU16() | (readU16() << 16)
    def skip(n: Int): Unit = { var k = 0; while (k < n) { readU8(); k += 1 } }

    /** XLUnicodeRichExtendedString: cch chars already read into `cch`.
      * Reads flags + optional rich/ext headers + characters (+ trailing
      * rich runs / ext block), re-reading the flags byte at each CONTINUE
      * boundary crossed mid-characters.
      */
    def readUnicodeBody(cch: Int): String = {
      var flags = readU8()
      val rich = (flags & 0x08) != 0
      val ext = (flags & 0x04) != 0
      val cRun = if (rich) readU16() else 0
      val cbExt = if (ext) readU32() else 0
      val sb = new java.lang.StringBuilder(cch)
      var read = 0
      var high = (flags & 0x01) != 0
      while (read < cch) {
        // EVERY continuation of the character array restarts with a fresh
        // compression-flag byte — including the edge where the split falls
        // between the string header and its first character (read == 0)
        if (atBoundary) { flags = readU8(); high = (flags & 0x01) != 0 }
        val c = if (high) readU16() else readU8()
        sb.append(c.toChar)
        read += 1
      }
      skip(cRun * 4)
      skip(cbExt)
      sb.toString
    }

    /** 16-bit-length unicode string (SST entries, LABEL, STRING). */
    def readUnicodeString(): String = readUnicodeBody(readU16())
  }

  /** One BIFF record view into the stream. */
  private final case class Rec(typ: Int, at: Int, data: Array[Byte])

  private def recordsFrom(stream: Array[Byte], start: Int): Iterator[Rec] =
    new Iterator[Rec] {
      private var pos = start
      def hasNext: Boolean = pos + 4 <= stream.length && {
        // a zeroed tail (padding after the terminal EOF) is not a record
        u16(stream, pos) != 0 || u16(stream, pos + 2) != 0
      }
      def next(): Rec = {
        val t = u16(stream, pos)
        val len = u16(stream, pos + 2)
        require(pos + 4 + len <= stream.length,
          s"truncated BIFF record: type=0x${t.toHexString} at $pos " +
            s"declares $len bytes but only ${stream.length - pos - 4} remain")
        val d = java.util.Arrays.copyOfRange(stream, pos + 4, pos + 4 + len)
        val r = Rec(t, pos, d)
        pos += 4 + len
        r
      }
    }

  private def lookupCharset(n: String): Option[java.nio.charset.Charset] =
    try Some(java.nio.charset.Charset.forName(n)) catch { case _: Exception => None }

  /** The de-facto default for BIFF5 files that never declare a CODEPAGE:
    * real Excel 5/95 writers on Windows used the ANSI codepage, almost
    * always 1252 — which differs from ISO-8859-1 in 0x80-0x9F (curly
    * quotes, dashes, the euro), exactly the bytes UK/US business files use.
    */
  private[sources] val Windows1252: java.nio.charset.Charset =
    lookupCharset("windows-1252")
      .getOrElse(java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Charset for a CODEPAGE record value: the windows codepage family
    * (1252 etc.), with the historical aliases BIFF5 writers used. 1200
    * (UTF-16, what BIFF8 declares) never decodes byte strings.
    */
  private def charsetFor(codepage: Int): java.nio.charset.Charset = {
    def lookup = lookupCharset _
    codepage match {
      case 367 => java.nio.charset.StandardCharsets.US_ASCII
      case 10000 => lookup("MacRoman").getOrElse(Windows1252)
      case cp => lookup(s"windows-$cp").orElse(lookup(s"cp$cp"))
        .getOrElse(Windows1252)
    }
  }

  /** BIFF5 byte string at `off`: `lenBytes`-wide length then codepage
    * characters.
    */
  private def byteString(b: Array[Byte], off: Int, lenBytes: Int,
                         cs: java.nio.charset.Charset): String = {
    val cch = if (lenBytes == 1) u8(b, off) else u16(b, off)
    new String(b, off + lenBytes, cch, cs)
  }

  /** Short (8-bit length) unicode string — BOUNDSHEET names. */
  private def shortUnicode(b: Array[Byte], off: Int): String = {
    val cch = u8(b, off)
    val flags = u8(b, off + 1)
    if ((flags & 0x01) != 0)
      new String(b, off + 2, cch * 2, java.nio.charset.StandardCharsets.UTF_16LE)
    else {
      val sb = new java.lang.StringBuilder(cch)
      var i = 0
      while (i < cch) { sb.append((b(off + 2 + i) & 0xFF).toChar); i += 1 }
      sb.toString
    }
  }

  /** Parse the workbook-globals substream: sheet catalog, SST, date system,
    * and which XF indices render as dates (custom FORMAT codes share the
    * xlsx date-token heuristic; builtin ifmt ids share the xlsx table).
    */
  def open(fileBytes: Array[Byte]): XlsWorkbook = {
    // BIFF8 names the stream "Workbook"; BIFF5/7 (Excel 5/95) names it
    // "Book". Try both; anything else is not an Excel compound file.
    val stream =
      try cfbStream(fileBytes, "Workbook")
      catch {
        case e: IllegalArgumentException if e.getMessage != null &&
          e.getMessage.contains("no stream") =>
          try cfbStream(fileBytes, "Book")
          catch {
            case e2: IllegalArgumentException if e2.getMessage != null &&
              e2.getMessage.contains("no stream") =>
              throw new IllegalArgumentException(
                "xls: compound file has neither a 'Workbook' (BIFF8) nor a 'Book' (BIFF5/7) stream", e)
          }
      }
    require(stream.length >= 6 && u16(stream, 0) == RecBofBiff8,
      "xls: workbook stream does not start with a BIFF5+ BOF " +
        "(BIFF2-4 single-stream files are not supported)")
    // BOF vers: 0x0600 = BIFF8, 0x0500 = BIFF5/7 (Excel 5 and 95 share it)
    val biff5 = u16(stream, 4) < 0x0600

    // BIFF5 byte strings in the globals (FORMAT codes, BOUNDSHEET names)
    // decode with the workbook CODEPAGE — but some writers emit FORMAT or
    // BOUNDSHEET records BEFORE the CODEPAGE record, so collect the raw
    // bytes during the scan and decode only once the substream is done and
    // the final charset is known (ADVICE r7; default windows-1252 above).
    val sheets = mutable.ArrayBuffer.empty[(String, Int)]     // BIFF8 inline
    val rawSheets = mutable.ArrayBuffer.empty[(Rec, Int)]     // BIFF5 deferred
    var date1904 = false
    var charset = Windows1252: java.nio.charset.Charset
    val customDateFmts = mutable.Set.empty[Int]
    val rawFormats = mutable.ArrayBuffer.empty[Rec]            // BIFF5 deferred
    val xfFmts = mutable.ArrayBuffer.empty[Int]
    val sstStrings = mutable.ArrayBuffer.empty[String]

    val it = recordsFrom(stream, 0).buffered
    var depth = 0
    var done = false
    while (it.hasNext && !done) {
      val r = it.next()
      r.typ match {
        case RecBofBiff8 => depth += 1
        case RecEof => depth -= 1; if (depth <= 0) done = true
        case RecDateMode => date1904 = u16(r.data, 0) == 1
        case RecCodepage => if (biff5) charset = charsetFor(u16(r.data, 0))
        case RecFormat =>
          if (biff5) rawFormats += r
          else {
            val ifmt = u16(r.data, 0)
            val code = new RecCursor(IndexedSeq(
              java.util.Arrays.copyOfRange(r.data, 2, r.data.length))).readUnicodeString()
            if (Excel.isDateFormatCode(code)) customDateFmts += ifmt
          }
        case RecXf => xfFmts += u16(r.data, 2) // ifmt at offset 2 in BIFF5 and BIFF8
        case RecBoundsheet =>
          val pos = i32(r.data, 0)
          val typ = u8(r.data, 5) // 0 = worksheet
          if (typ == 0) {
            if (biff5) rawSheets += ((r, pos))
            else sheets += ((shortUnicode(r.data, 6), pos))
          }
        case RecSst => // BIFF8 only; BIFF5 has no shared string table
          val parts = mutable.ArrayBuffer(r.data)
          while (it.hasNext && it.head.typ == RecContinue) parts += it.next().data
          val cur = new RecCursor(parts.toIndexedSeq)
          cur.skip(4) // cstTotal
          val unique = cur.readU32()
          var k = 0
          while (k < unique) { sstStrings += cur.readUnicodeString(); k += 1 }
        case _ => ()
      }
    }

    // Deferred BIFF5 decodes, now under the substream's final charset.
    rawFormats.foreach { r =>
      val ifmt = u16(r.data, 0)
      if (Excel.isDateFormatCode(byteString(r.data, 2, 1, charset)))
        customDateFmts += ifmt
    }
    val allSheets =
      if (biff5) rawSheets.map { case (r, pos) =>
        (byteString(r.data, 6, 1, charset), pos)
      }.toSeq
      else sheets.toSeq

    val dateXfs = xfFmts.zipWithIndex.collect {
      case (fmt, i) if Excel.BuiltinDateFmts(fmt) || customDateFmts(fmt) => i
    }.toSet
    XlsWorkbook(allSheets, stream, sstStrings.toIndexedSeq, dateXfs,
      date1904, biff5, charset)
  }

  /** Decode an RK value: 30-bit int or truncated IEEE double, either
    * optionally divided by 100 (MS-XLS 2.5.198.112).
    */
  private[sources] def rkValue(rk: Int): Double = {
    val base =
      if ((rk & 0x02) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if ((rk & 0x01) != 0) base / 100d else base
  }

  /** Canonical numeric rendering for the staging contract: integral values
    * print without a fractional part (like the raw `<v>` text an xlsx
    * carries), everything else via Double.toString.
    */
  private[sources] def renderNumber(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else v.toString

  /** Cell grid of one worksheet (by index into the catalog): rows of
    * nullable strings padded to the widest row — the same shape
    * [[Excel.sheetGrid]] produces, so the staging reader is
    * container-agnostic. `renderDates` applies [[Excel.serialToDateString]]
    * to numerics whose XF carries a date number format.
    */
  def sheetGrid(wb: XlsWorkbook, sheetIdx: Int,
                renderDates: Boolean = true): Vector[Array[String]] = {
    require(sheetIdx >= 0 && sheetIdx < wb.sheets.length,
      s"no sheet $sheetIdx in ${wb.sheetNames}")
    val cells = mutable.ArrayBuffer.empty[(Int, Int, String)] // row, col, value
    var maxRow = -1
    var maxCol = -1

    def put(row: Int, col: Int, v: String): Unit = if (v != null) {
      cells += ((row, col, v))
      if (row > maxRow) maxRow = row
      if (col > maxCol) maxCol = col
    }
    def num(row: Int, col: Int, ixfe: Int, v: Double): Unit =
      put(row, col,
        if (renderDates && wb.dateXfs(ixfe)) Excel.serialToDateString(v, wb.date1904)
        else renderNumber(v))

    val it = recordsFrom(wb.stream, wb.sheets(sheetIdx)._2).buffered
    require(it.hasNext && it.next().typ == RecBofBiff8,
      "xls: sheet offset does not land on a BOF")
    var depth = 1
    var pendingString: Option[(Int, Int)] = None // FORMULA awaiting STRING
    while (it.hasNext && depth > 0) {
      val r = it.next()
      r.typ match {
        case RecBofBiff8 => depth += 1 // nested chart/macro substream: skip its records
        case RecEof => depth -= 1
        case _ if depth > 1 => ()
        case RecNumber =>
          num(u16(r.data, 0), u16(r.data, 2), u16(r.data, 4),
            java.lang.Double.longBitsToDouble(
              (0 until 8).map(k => (r.data(6 + k).toLong & 0xFF) << (8 * k)).reduce(_ | _)))
        case RecRk =>
          num(u16(r.data, 0), u16(r.data, 2), u16(r.data, 4), rkValue(i32(r.data, 6)))
        case RecMulRk =>
          val row = u16(r.data, 0)
          val colFirst = u16(r.data, 2)
          val n = (r.data.length - 6) / 6
          var k = 0
          while (k < n) {
            num(row, colFirst + k, u16(r.data, 4 + 6 * k), rkValue(i32(r.data, 6 + 6 * k)))
            k += 1
          }
        case RecLabelSst =>
          val isst = i32(r.data, 6)
          if (isst >= 0 && isst < wb.sst.length)
            put(u16(r.data, 0), u16(r.data, 2), wb.sst(isst))
        case RecLabel =>
          put(u16(r.data, 0), u16(r.data, 2),
            if (wb.biff5) byteString(r.data, 6, 2, wb.charset)
            else new RecCursor(IndexedSeq(
              java.util.Arrays.copyOfRange(r.data, 6, r.data.length))).readUnicodeString())
        case RecRString if wb.biff5 =>
          // rich-text label: like LABEL plus trailing formatting runs,
          // which the staging contract (raw strings) ignores
          put(u16(r.data, 0), u16(r.data, 2), byteString(r.data, 6, 2, wb.charset))
        case RecBoolErr =>
          val isErr = u8(r.data, 7) == 1
          if (!isErr) // error cells → null, like sentinel-na text
            put(u16(r.data, 0), u16(r.data, 2), if (u8(r.data, 6) == 1) "TRUE" else "FALSE")
        case RecFormula =>
          val row = u16(r.data, 0)
          val col = u16(r.data, 2)
          val ixfe = u16(r.data, 4)
          if (u16(r.data, 12) == 0xFFFF) u8(r.data, 6) match {
            case 0 => pendingString = Some((row, col)) // value in next STRING
            case 1 => put(row, col, if (u8(r.data, 8) == 1) "TRUE" else "FALSE")
            case 3 => () // blank string result → null, like the xlsx path
            case _ => () // error result → null
          } else num(row, col, ixfe,
            java.lang.Double.longBitsToDouble(
              (0 until 8).map(k => (r.data(6 + k).toLong & 0xFF) << (8 * k)).reduce(_ | _)))
        case RecString =>
          pendingString.foreach { case (row, col) =>
            val v =
              if (wb.biff5) byteString(r.data, 0, 2, wb.charset)
              else {
                val parts = mutable.ArrayBuffer(r.data)
                while (it.hasNext && it.head.typ == RecContinue) parts += it.next().data
                new RecCursor(parts.toIndexedSeq).readUnicodeString()
              }
            if (v.nonEmpty) put(row, col, v) // empty → null (xlsx parity)
          }
          pendingString = None
        case _ => ()
      }
    }

    if (maxRow < 0) Vector.empty
    else {
      val width = maxCol + 1
      val grid = Array.fill(maxRow + 1)(new Array[String](width))
      cells.foreach { case (row, col, v) => grid(row)(col) = v }
      // row indices are absolute (readxl semantics: an explicit `skip`
      // counts spreadsheet rows, so cell-less rows surface as all-null)
      grid.toVector
    }
  }
}
