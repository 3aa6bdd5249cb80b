package graft.multimodal

/** EXIF APP1 / TIFF-IFD WALKER — the structured-metadata layer above
  * [[Jpeg]]'s segment census: a real endian-aware TIFF directory parser
  * (II and MM byte orders, typed entries with the ≤4-byte inline-value
  * rule, offset-addressed RATIONAL/ASCII payloads, the Exif sub-IFD
  * pointer chain) extracting the fields a vision-data pipeline actually
  * routes on: orientation (the rotate-before-train bug class), pixel
  * dimensions as CLAIMED by metadata (vs the SOF truth — mismatch is a
  * corruption signal), resolution rational, and capture timestamp.
  *
  * Robustness contract (the wavMeta/Jpeg clamp discipline): every read
  * is bounds-checked against the buffer, IFD entry counts are clamped,
  * the sub-IFD hop is single-level (no pointer loops), and any
  * structural violation returns None rather than reading past the end.
  *
  * The companion [[build]] assembles a spec-conforming APP1 payload
  * (both byte orders) so the m_exif_meta gate exercises writer + walker
  * under a formula-replay oracle, the m_png_meta injector pattern — the
  * JDK has no EXIF writer, and vendoring one would be a codec-SPI
  * boundary violation.
  */
object Exif {

  final case class ExifMeta(
      byteOrder: String, orientation: Int,
      xresNum: Long, xresDen: Long, dateTime: String,
      pixelW: Long, pixelH: Long, ifd0Entries: Int)

  private val ExifTag = Array[Byte]('E', 'x', 'i', 'f', 0, 0)

  /** Max IFD entries honored — a crafted count field cannot walk the
    * parser off a petabyte scan (real IFDs carry dozens of entries). */
  private val MaxEntries = 256

  /** Locate the APP1/Exif segment in a JPEG stream (marker-aligned walk,
    * stops at SOS — EXIF precedes entropy data per spec) and parse it. */
  def meta(jpeg: Array[Byte]): Option[ExifMeta] = {
    def u8(o: Int): Int = jpeg(o) & 0xff
    def u16(o: Int): Int = (u8(o) << 8) | u8(o + 1)
    if (jpeg.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None
    var o = 2
    var steps = 0
    while (o + 3 < jpeg.length) {
      steps += 1
      if (steps > 100000 || u8(o) != 0xff) return None
      val code = u8(o + 1)
      if (code == 0xff) { o += 1 }
      else if (code == 0xd9 || code == 0xda) return None // hit scan/EOI: no EXIF
      else if (code == 0xd8 || code == 0x01 ||
          (code >= 0xd0 && code <= 0xd7)) o += 2
      else {
        val len = u16(o + 2)
        if (len < 2 || o + 2 + len > jpeg.length) return None
        if (code == 0xe1 && len >= 2 + ExifTag.length &&
            java.util.Arrays.equals(
              java.util.Arrays.copyOfRange(jpeg, o + 4, o + 4 + ExifTag.length),
              ExifTag))
          return fromTiff(java.util.Arrays.copyOfRange(
            jpeg, o + 4 + ExifTag.length, o + 2 + len))
        o += 2 + len
      }
    }
    None
  }

  /** Parse a TIFF block (the APP1 payload after "Exif\0\0"). */
  def fromTiff(b: Array[Byte]): Option[ExifMeta] = {
    if (b.length < 8) return None
    val little = (b(0), b(1)) match {
      case ('I', 'I') => true
      case ('M', 'M') => false
      case _          => return None
    }
    def u8(o: Int): Long = b(o) & 0xffL
    def ok(o: Int, n: Int): Boolean = o >= 0 && o + n <= b.length
    def u16(o: Int): Long =
      if (little) u8(o) | (u8(o + 1) << 8) else (u8(o) << 8) | u8(o + 1)
    def u32(o: Int): Long =
      if (little) u8(o) | (u8(o + 1) << 8) | (u8(o + 2) << 16) | (u8(o + 3) << 24)
      else (u8(o) << 24) | (u8(o + 1) << 16) | (u8(o + 2) << 8) | u8(o + 3)
    if (u16(2) != 42L) return None
    val ifd0 = u32(4)
    if (ifd0 > Int.MaxValue || !ok(ifd0.toInt, 2)) return None

    var orientation = -1
    var xn = -1L; var xd = -1L
    var dt: String = null
    var pw = -1L; var ph = -1L
    var exifPtr = -1L
    var n0 = -1

    // typed scalar read honoring the inline-vs-offset rule; SHORT and
    // LONG both surface as Long (PixelXDimension is written as either)
    def scalar(tpe: Long, cnt: Long, valOff: Int): Option[Long] = (tpe, cnt) match {
      case (3, 1) => if (ok(valOff, 2)) Some(u16(valOff)) else None // SHORT inline
      case (4, 1) => if (ok(valOff, 4)) Some(u32(valOff)) else None // LONG inline
      case _      => None
    }

    def walk(ifdOff: Int, isIfd0: Boolean): Boolean = {
      if (!ok(ifdOff, 2)) return false
      val rawN = u16(ifdOff)
      if (rawN > MaxEntries) return false
      val n = rawN.toInt
      if (!ok(ifdOff + 2, n * 12)) return false
      if (isIfd0) n0 = n
      var i = 0
      while (i < n) {
        val e = ifdOff + 2 + i * 12
        val tag = u16(e); val tpe = u16(e + 2); val cnt = u32(e + 4)
        val valOff = e + 8
        tag match {
          case 0x0112 =>
            scalar(tpe, cnt, valOff).foreach(v => orientation = v.toInt)
          case 0x011a if tpe == 5 && cnt == 1 => // RATIONAL: 8 bytes at offset
            val p = u32(valOff)
            if (p > Int.MaxValue || !ok(p.toInt, 8)) return false
            xn = u32(p.toInt); xd = u32(p.toInt + 4)
          case 0x0132 if tpe == 2 => // ASCII incl. trailing NUL, at offset if > 4
            if (cnt > 4) {
              val p = u32(valOff)
              if (p > Int.MaxValue || cnt > Int.MaxValue || !ok(p.toInt, cnt.toInt))
                return false
              dt = new String(b, p.toInt, cnt.toInt - 1, "US-ASCII")
            } else if (cnt > 0 && ok(valOff, cnt.toInt))
              dt = new String(b, valOff, cnt.toInt - 1, "US-ASCII")
          case 0x8769 if isIfd0 =>
            scalar(tpe, cnt, valOff).foreach(v => exifPtr = v)
          case 0xa002 => scalar(tpe, cnt, valOff).foreach(v => pw = v)
          case 0xa003 => scalar(tpe, cnt, valOff).foreach(v => ph = v)
          case _ => ()
        }
        i += 1
      }
      true
    }

    if (!walk(ifd0.toInt, isIfd0 = true)) return None
    if (exifPtr >= 0) { // single-level hop — no loops possible
      if (exifPtr > Int.MaxValue || !walk(exifPtr.toInt, isIfd0 = false)) return None
    }
    if (orientation < 0 || dt == null) None
    else Some(ExifMeta(if (little) "II" else "MM", orientation,
      xn, xd, dt, pw, ph, n0))
  }

  /** Assemble a complete APP1 segment (marker + length + "Exif\0\0" +
    * TIFF block) carrying IFD0 {Orientation, XResolution, DateTime,
    * ExifIFDPointer} and a sub-IFD {PixelXDimension, PixelYDimension} —
    * offset-addressed payloads laid out after each directory exactly per
    * the TIFF spec, in either byte order. */
  def build(little: Boolean, orientation: Int, xresNum: Long, xresDen: Long,
      dateTime: String, pixelW: Long, pixelH: Long): Array[Byte] = {
    require(dateTime.length == 19, "EXIF DateTime is exactly 19 chars")
    val tiff = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = tiff.write(v & 0xff)
    def w16(v: Long): Unit =
      if (little) { w8(v.toInt); w8((v >> 8).toInt) }
      else { w8((v >> 8).toInt); w8(v.toInt) }
    def w32(v: Long): Unit =
      if (little) { w8(v.toInt); w8((v >> 8).toInt); w8((v >> 16).toInt); w8((v >> 24).toInt) }
      else { w8((v >> 24).toInt); w8((v >> 16).toInt); w8((v >> 8).toInt); w8(v.toInt) }
    // TIFF header
    tiff.write(if (little) 'I' else 'M'); tiff.write(if (little) 'I' else 'M')
    w16(42); w32(8)
    // IFD0: 4 entries -> 2 + 48 + 4 = 54 bytes, [8, 62)
    val ratOff = 62L; val dtOff = 70L; val subOff = 90L
    w16(4)
    w16(0x0112); w16(3); w32(1); w16(orientation); w16(0) // SHORT inline, padded
    w16(0x011a); w16(5); w32(1); w32(ratOff)
    w16(0x0132); w16(2); w32(20); w32(dtOff)
    w16(0x8769); w16(4); w32(1); w32(subOff)
    w32(0) // no IFD1
    w32(xresNum); w32(xresDen) // [62, 70)
    tiff.write(dateTime.getBytes("US-ASCII")); w8(0) // [70, 90)
    // Exif sub-IFD: 2 entries -> 2 + 24 + 4 = 30 bytes, [90, 120)
    w16(2)
    w16(0xa002); w16(4); w32(1); w32(pixelW)
    w16(0xa003); w16(4); w32(1); w32(pixelH)
    w32(0)
    val payload = ExifTag ++ tiff.toByteArray
    val len = payload.length + 2
    Array(0xff.toByte, 0xe1.toByte, (len >> 8).toByte, (len & 0xff).toByte) ++ payload
  }

  /** Splice an APP1 segment into a JPEG immediately after SOI. */
  def spliceApp1(jpeg: Array[Byte], app1: Array[Byte]): Array[Byte] =
    jpeg.take(2) ++ app1 ++ jpeg.drop(2)
}
