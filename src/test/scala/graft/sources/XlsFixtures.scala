package graft.sources

import java.io.ByteArrayOutputStream
import scala.collection.mutable

/** Builds minimal but REAL legacy .xls bytes for tests: a CFB compound
  * container (FAT or ministream layout) holding a BIFF8 Workbook stream.
  * Cell encodings mirror [[ExcelFixtures]]' API and add the BIFF-specific
  * shapes: String → SST+LABELSST; Int → RK (runs of ≥2 consecutive Ints →
  * one MULRK); other numerics → NUMBER; Boolean → BOOLERR; Inline(s) →
  * LABEL; FormulaStr(s) → FORMULA with a string result + STRING record;
  * DateSerial/DateTimeSerial/Styled as styled NUMBERs (XF 1 = builtin date
  * format 14, XF 2 = custom FORMAT 165 "yyyy-mm-dd hh:mm", XF 3 = plain
  * 0.00); null → omitted (sparse).
  *
  * `sstCap` bounds each SST/CONTINUE payload so small caps force the
  * mid-string CONTINUE splits (fresh compression-flag byte per part) that
  * real multi-thousand-string workbooks produce. `padStreamTo` zero-pads
  * the Workbook stream past the CFB mini-stream cutoff (4096) to exercise
  * the regular-FAT layout; small streams land in the ministream.
  */
object XlsFixtures {

  import ExcelFixtures.{Inline, DateSerial, DateTimeSerial, Styled}
  final case class FormulaStr(s: String)

  // ---- little-endian byte building ----
  private final class B {
    val out = new ByteArrayOutputStream()
    def u8(v: Int): B = { out.write(v & 0xFF); this }
    def u16(v: Int): B = { u8(v); u8(v >> 8) }
    def u32(v: Int): B = { u16(v); u16(v >> 16) }
    def f64(v: Double): B = {
      val bits = java.lang.Double.doubleToLongBits(v)
      (0 until 8).foreach(i => u8((bits >> (8 * i)).toInt)); this
    }
    def bytes(b: Array[Byte]): B = { out.write(b); this }
    def result: Array[Byte] = out.toByteArray
  }

  private def rec(typ: Int)(body: B => Unit): Array[Byte] = {
    val b = new B; body(b)
    val d = b.result
    require(d.length <= 8224, "record too long for fixture")
    new B().u16(typ).u16(d.length).bytes(d).result
  }

  /** BIFF8 16-bit-length unicode string: compressed when all chars fit in
    * one byte, UTF-16LE otherwise.
    */
  private def unicodeString(s: String): Array[Byte] = {
    val high = s.exists(_ >= 0x100)
    val b = new B().u16(s.length).u8(if (high) 1 else 0)
    s.foreach(c => if (high) b.u16(c.toInt) else b.u8(c.toInt))
    b.result
  }

  /** SST payload split into (first, continues) honouring `cap` bytes per
    * part, re-emitting a fresh flags byte when a string's characters span a
    * part boundary (the BIFF8 CONTINUE rule).
    */
  private def sstParts(strings: Seq[String], cap: Int): Seq[Array[Byte]] = {
    val parts = mutable.ArrayBuffer.empty[Array[Byte]]
    var cur = new B().u32(strings.map(_ => 1).sum).u32(strings.length)
    def room: Int = cap - cur.result.length
    def flush(): Unit = { parts += cur.result; cur = new B }
    for (s <- strings) {
      if (room < 3 + 2) flush() // never split the cch/flags header
      val high = s.exists(_ >= 0x100)
      val w = if (high) 2 else 1
      cur.u16(s.length).u8(if (high) 1 else 0)
      var i = 0
      while (i < s.length) {
        if (room < w) { flush(); cur.u8(if (high) 1 else 0) } // fresh flags byte
        if (high) cur.u16(s.charAt(i).toInt) else cur.u8(s.charAt(i).toInt)
        i += 1
      }
    }
    flush()
    parts.toSeq
  }

  /** The BIFF8 Workbook stream: globals substream (BOF, DATEMODE, FORMAT,
    * XFs, BOUNDSHEETs, SST, EOF) then one substream per sheet.
    */
  private def workbookStream(sheets: Seq[(String, Seq[Seq[Any]])],
                             date1904: Boolean, sstCap: Int): Array[Byte] = {
    val sstIdx = mutable.LinkedHashMap.empty[String, Int]
    def sstId(s: String): Int = sstIdx.getOrElseUpdate(s, sstIdx.size)

    def bof(dt: Int) = rec(0x0809)(_.u16(0x0600).u16(dt).u16(0x0DBB).u16(0x07CC)
      .u32(0).u32(0))
    val eof = rec(0x000A)(_ => ())

    val sheetStreams: Seq[Array[Byte]] = sheets.map { case (_, rows) =>
      val body = new B().bytes(bof(0x0010))
      rows.zipWithIndex.foreach { case (cells, ri) =>
        var ci = 0
        while (ci < cells.length) {
          cells(ci) match {
            case null => ci += 1
            case v: Int =>
              // runs of ≥2 consecutive Ints become one MULRK
              var j = ci
              while (j < cells.length && cells(j).isInstanceOf[Int]) j += 1
              if (j - ci >= 2) {
                body.bytes(rec(0x00BD) { b =>
                  b.u16(ri).u16(ci)
                  (ci until j).foreach(k =>
                    b.u16(0).u32((cells(k).asInstanceOf[Int] << 2) | 0x02))
                  b.u16(j - 1)
                })
                ci = j
              } else {
                body.bytes(rec(0x027E)(_.u16(ri).u16(ci).u16(0).u32((v << 2) | 0x02)))
                ci += 1
              }
            case other =>
              val r = other match {
                case s: String =>
                  rec(0x00FD)(_.u16(ri).u16(ci).u16(0).u32(sstId(s)))
                case Inline(s) =>
                  rec(0x0204)(_.u16(ri).u16(ci).u16(0).bytes(unicodeString(s)))
                case b: Boolean =>
                  rec(0x0205)(_.u16(ri).u16(ci).u16(0).u8(if (b) 1 else 0).u8(0))
                case DateSerial(d) => rec(0x0203)(_.u16(ri).u16(ci).u16(1).f64(d))
                case DateTimeSerial(d) => rec(0x0203)(_.u16(ri).u16(ci).u16(2).f64(d))
                case Styled(d, s) => rec(0x0203)(_.u16(ri).u16(ci).u16(s).f64(d))
                case FormulaStr(s) =>
                  rec(0x0006)(_.u16(ri).u16(ci).u16(0)
                    .u8(0).u8(0).u32(0).u16(0xFFFF) // string-result marker
                    .u16(0).u32(0).u16(0)) ++       // grbit, chn, empty rgce
                    rec(0x0207)(_.bytes(unicodeString(s)))
                case d: Double => rec(0x0203)(_.u16(ri).u16(ci).u16(0).f64(d))
                case l: Long => rec(0x0203)(_.u16(ri).u16(ci).u16(0).f64(l.toDouble))
                case x => throw new IllegalArgumentException(s"fixture cell: $x")
              }
              body.bytes(r)
              ci += 1
          }
        }
      }
      body.bytes(eof).result
    }

    // globals, with BOUNDSHEET offsets patched in a second pass
    def globals(offsets: Seq[Int]): Array[Byte] = {
      val g = new B().bytes(bof(0x0005))
      g.bytes(rec(0x0022)(_.u16(if (date1904) 1 else 0)))
      g.bytes(rec(0x041E)(_.u16(165).bytes(unicodeString("yyyy-mm-dd hh:mm"))))
      Seq(0, 14, 165, 2).foreach(ifmt =>
        g.bytes(rec(0x00E0)(_.u16(0).u16(ifmt).bytes(new Array[Byte](16)))))
      sheets.zip(offsets).foreach { case ((name, _), off) =>
        g.bytes(rec(0x0085) { b =>
          b.u32(off).u16(0).u8(name.length).u8(0)
          name.foreach(c => b.u8(c.toInt))
        })
      }
      val parts = sstParts(sstIdx.keys.toSeq, sstCap)
      g.bytes(new B().u16(0x00FC).u16(parts.head.length).bytes(parts.head).result)
      parts.tail.foreach(p =>
        g.bytes(new B().u16(0x003C).u16(p.length).bytes(p).result))
      g.bytes(eof).result
    }

    val fixedLen = globals(sheets.map(_ => 0)).length // offsets are fixed-width
    val offsets = sheetStreams.scanLeft(fixedLen)(_ + _.length).init
    val out = new B().bytes(globals(offsets))
    sheetStreams.foreach(out.bytes)
    out.result
  }

  /** Wrap a stream in a CFB v3 container (512-byte sectors). Streams under
    * the 4096 cutoff go to the ministream via the miniFAT; larger ones get
    * regular FAT sectors.
    */
  private def cfb(stream: Array[Byte], streamName: String = "Workbook"): Array[Byte] = {
    val sec = 512
    val mini = stream.length < 4096

    def padTo(b: Array[Byte], n: Int): Array[Byte] =
      java.util.Arrays.copyOf(b, ((b.length + n - 1) / n) * n)

    // sector plan (numbered after the header):
    //   mini:   0=FAT 1=dir 2=miniFAT 3..=ministream
    //   direct: 0=FAT 1=dir 2..=stream
    val payload = if (mini) padTo(stream, 64) else padTo(stream, sec)
    val payloadSectors = payload.length / sec + (if (payload.length % sec != 0) 1 else 0)
    val payloadStart = if (mini) 3 else 2

    val fat = Array.fill(sec / 4)(0xFFFFFFFF)
    fat(0) = 0xFFFFFFFD // FAT sector marks itself
    fat(1) = 0xFFFFFFFE // directory, one sector
    if (mini) fat(2) = 0xFFFFFFFE // miniFAT, one sector
    (0 until payloadSectors).foreach { i =>
      fat(payloadStart + i) =
        if (i == payloadSectors - 1) 0xFFFFFFFE else payloadStart + i + 1
    }
    require(payloadStart + payloadSectors <= sec / 4, "fixture stream too large for one FAT sector")

    def dirEntry(name: String, typ: Int, child: Int, start: Int, size: Int): Array[Byte] = {
      val b = new B
      val n = name.take(31)
      n.foreach(c => b.u16(c.toInt)); (n.length until 32).foreach(_ => b.u16(0))
      b.u16(if (n.isEmpty) 0 else (n.length + 1) * 2)
      b.u8(typ).u8(1) // black
      b.u32(-1).u32(-1).u32(child)
      (0 until 9).foreach(_ => b.u32(0)) // CLSID, state, times
      b.u32(start).u32(size).u32(0)
      b.result
    }
    val dir = new B()
      .bytes(dirEntry("Root Entry", 5, 1,
        if (mini) payloadStart else 0xFFFFFFFE, if (mini) payload.length else 0))
      .bytes(dirEntry(streamName, 2, -1,
        if (mini) 0 else payloadStart, stream.length))
      .bytes(dirEntry("", 0, -1, -1, 0))
      .bytes(dirEntry("", 0, -1, -1, 0))
      .result

    val miniFatSector: Array[Byte] = if (!mini) Array.empty else {
      val n = (stream.length + 63) / 64
      val b = new B
      (0 until n).foreach(i => b.u32(if (i == n - 1) 0xFFFFFFFE else i + 1))
      (n until sec / 4).foreach(_ => b.u32(0xFFFFFFFF))
      b.result
    }

    val h = new B
    h.u32(0xE011CFD0).u32(0xE11AB1A1) // signature
    h.bytes(new Array[Byte](16))      // CLSID
    h.u16(0x003E).u16(0x0003)         // minor, major (v3)
    h.u16(0xFFFE)                     // little-endian BOM
    h.u16(9).u16(6)                   // sector 512, mini 64
    h.bytes(new Array[Byte](6))
    h.u32(0)                          // dir sector count (v3: 0)
    h.u32(1)                          // FAT sector count
    h.u32(1)                          // first directory sector
    h.u32(0)                          // txn signature
    h.u32(4096)                       // mini cutoff
    h.u32(if (mini) 2 else 0xFFFFFFFE) // first miniFAT sector
    h.u32(if (mini) 1 else 0)         // miniFAT sector count
    h.u32(0xFFFFFFFE).u32(0)          // no DIFAT chain
    h.u32(0)                          // DIFAT[0] = FAT sector 0
    (1 until 109).foreach(_ => h.u32(0xFFFFFFFF))
    require(h.result.length == 512, s"bad header: ${h.result.length}")

    val body = new B().bytes(h.result)
    val fatBytes = { val b = new B; fat.foreach(b.u32); b.result }
    body.bytes(fatBytes).bytes(padTo(dir, sec))
    if (mini) body.bytes(miniFatSector)
    body.bytes(padTo(payload, sec))
    body.result
  }

  /** Assemble a complete .xls file. `padStreamTo` forces the Workbook
    * stream to at least that many bytes (zero tail after the terminal EOF)
    * — ≥4096 exercises the regular-FAT container layout.
    */
  def xls(sheets: Seq[(String, Seq[Seq[Any]])],
          date1904: Boolean = false,
          sstCap: Int = 8224,
          padStreamTo: Int = 0): Array[Byte] = {
    val stream = workbookStream(sheets, date1904, sstCap)
    cfb(if (stream.length >= padStreamTo) stream
        else java.util.Arrays.copyOf(stream, padStreamTo))
  }

  // ------------------------------------------------------------------
  // BIFF5 (Excel 5/95) builder — the legacy-legacy vintage: "Book"
  // stream, no SST (strings inline in LABEL/RSTRING as codepage byte
  // strings), 8-bit-length byte strings for BOUNDSHEET names and FORMAT
  // codes, CODEPAGE record declaring the byte-string encoding.
  // ------------------------------------------------------------------

  final case class Rich(s: String) // → RSTRING (label + formatting runs)

  /** BIFF5 byte string with a `lenBytes`-wide length prefix. */
  private def byteString5(s: String, lenBytes: Int,
                          cs: java.nio.charset.Charset): Array[Byte] = {
    val chars = s.getBytes(cs)
    val b = new B
    if (lenBytes == 1) b.u8(chars.length) else b.u16(chars.length)
    b.bytes(chars).result
  }

  /** The BIFF5 Book stream: same substream layout as BIFF8, BIFF5 string
    * encodings.
    */
  private def bookStream5(sheets: Seq[(String, Seq[Seq[Any]])],
                          date1904: Boolean, codepage: Int,
                          cs: java.nio.charset.Charset,
                          codepageMode: String): Array[Byte] = {
    def bof(dt: Int) = rec(0x0809)(_.u16(0x0500).u16(dt).u16(0x0DBB).u16(0x07CC))
    val eof = rec(0x000A)(_ => ())

    val sheetStreams: Seq[Array[Byte]] = sheets.map { case (_, rows) =>
      val body = new B().bytes(bof(0x0010))
      rows.zipWithIndex.foreach { case (cells, ri) =>
        var ci = 0
        while (ci < cells.length) {
          cells(ci) match {
            case null => ci += 1
            case v: Int =>
              var j = ci
              while (j < cells.length && cells(j).isInstanceOf[Int]) j += 1
              if (j - ci >= 2) {
                body.bytes(rec(0x00BD) { b =>
                  b.u16(ri).u16(ci)
                  (ci until j).foreach(k =>
                    b.u16(0).u32((cells(k).asInstanceOf[Int] << 2) | 0x02))
                  b.u16(j - 1)
                })
                ci = j
              } else {
                body.bytes(rec(0x027E)(_.u16(ri).u16(ci).u16(0).u32((v << 2) | 0x02)))
                ci += 1
              }
            case other =>
              val r = other match {
                case s: String => // BIFF5: inline LABEL, no SST
                  rec(0x0204)(_.u16(ri).u16(ci).u16(0).bytes(byteString5(s, 2, cs)))
                case Inline(s) =>
                  rec(0x0204)(_.u16(ri).u16(ci).u16(0).bytes(byteString5(s, 2, cs)))
                case Rich(s) => // RSTRING: label chars then formatting runs
                  rec(0x00D6)(_.u16(ri).u16(ci).u16(0).bytes(byteString5(s, 2, cs))
                    .u8(1).u8(0).u8(0)) // one trailing (char, font) run
                case b: Boolean =>
                  rec(0x0205)(_.u16(ri).u16(ci).u16(0).u8(if (b) 1 else 0).u8(0))
                case DateSerial(d) => rec(0x0203)(_.u16(ri).u16(ci).u16(1).f64(d))
                case DateTimeSerial(d) => rec(0x0203)(_.u16(ri).u16(ci).u16(2).f64(d))
                case Styled(d, s) => rec(0x0203)(_.u16(ri).u16(ci).u16(s).f64(d))
                case FormulaStr(s) =>
                  rec(0x0006)(_.u16(ri).u16(ci).u16(0)
                    .u8(0).u8(0).u32(0).u16(0xFFFF) // string-result marker
                    .u16(0).u32(0).u16(0)) ++
                    rec(0x0207)(_.bytes(byteString5(s, 2, cs)))
                case d: Double => rec(0x0203)(_.u16(ri).u16(ci).u16(0).f64(d))
                case l: Long => rec(0x0203)(_.u16(ri).u16(ci).u16(0).f64(l.toDouble))
                case x => throw new IllegalArgumentException(s"fixture cell: $x")
              }
              body.bytes(r)
              ci += 1
          }
        }
      }
      body.bytes(eof).result
    }

    def globals(offsets: Seq[Int]): Array[Byte] = {
      val g = new B().bytes(bof(0x0005))
      if (codepageMode == "early") g.bytes(rec(0x0042)(_.u16(codepage)))
      g.bytes(rec(0x0022)(_.u16(if (date1904) 1 else 0)))
      g.bytes(rec(0x041E)(_.u16(165).bytes(byteString5("yyyy-mm-dd hh:mm", 1, cs))))
      Seq(0, 14, 165, 2).foreach(ifmt =>
        g.bytes(rec(0x00E0)(_.u16(0).u16(ifmt).bytes(new Array[Byte](12)))))
      sheets.zip(offsets).foreach { case ((name, _), off) =>
        g.bytes(rec(0x0085)(_.u32(off).u16(0).bytes(byteString5(name, 1, cs))))
      }
      // some real-world writers emit CODEPAGE after FORMAT/BOUNDSHEET
      if (codepageMode == "late") g.bytes(rec(0x0042)(_.u16(codepage)))
      g.bytes(eof).result
    }

    val fixedLen = globals(sheets.map(_ => 0)).length // offsets are fixed-width
    val offsets = sheetStreams.scanLeft(fixedLen)(_ + _.length).init
    val out = new B().bytes(globals(offsets))
    sheetStreams.foreach(out.bytes)
    out.result
  }

  /** Assemble a complete BIFF5 (Excel 5/95) .xls file. `codepageMode`:
    * "early" (record before the strings, the common layout), "late"
    * (after FORMAT/BOUNDSHEET — seen from real writers), or "none"
    * (no CODEPAGE record at all — reader must assume windows-1252).
    */
  def xls5(sheets: Seq[(String, Seq[Seq[Any]])],
           date1904: Boolean = false,
           codepage: Int = 1252,
           codepageMode: String = "early"): Array[Byte] = {
    val cs = java.nio.charset.Charset.forName(
      if (codepage == 367) "US-ASCII" else s"windows-$codepage")
    cfb(bookStream5(sheets, date1904, codepage, cs, codepageMode),
      streamName = "Book")
  }
}
