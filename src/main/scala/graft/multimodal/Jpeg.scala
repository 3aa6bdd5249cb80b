package graft.multimodal

/** Minimal JPEG/JFIF SEGMENT WALKER — the m_png_meta/m_wav_meta sibling
  * for the remaining major still-image container: marker-aligned segment
  * iteration (APP0/JFIF header, any SOFn frame header, entropy-coded scan
  * skip with stuffed-byte/RSTn awareness, EOI) with NO entropy decode.
  * This is the metadata pass a media pipeline runs over petabytes of
  * JPEGs (dimension census, progressive-vs-baseline routing, density
  * audit) where Huffman-decoding pixels would be the whole job.
  *
  * Robustness contract (the wavMeta clamp discipline): every offset is
  * bounds-checked, a misaligned marker or truncated segment returns None
  * rather than reading past the buffer, and the walk is step-bounded so
  * a crafted length field cannot loop it.
  */
object Jpeg {

  final case class JpegMeta(
      width: Int, height: Int, components: Int, bits: Int,
      sofCode: Int, jfifMajor: Int, jfifMinor: Int, densityUnit: Int,
      xDensity: Int, yDensity: Int, hasEoi: Boolean)

  private val JfifTag = "JFIF".getBytes("ISO-8859-1") :+ 0.toByte

  /** Walk `b`'s segments; None on any structural corruption. */
  def meta(b: Array[Byte]): Option[JpegMeta] = {
    def u8(o: Int): Int = b(o) & 0xff
    def u16(o: Int): Int = (u8(o) << 8) | u8(o + 1)
    if (b.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None
    var o = 2
    var w = -1; var h = -1; var nc = -1; var bits = -1; var sof = -1
    var jM = -1; var jm = -1; var du = -1; var xd = -1; var yd = -1
    var eoi = false
    var steps = 0
    while (o + 1 < b.length && !eoi) {
      steps += 1
      if (steps > 100000 || u8(o) != 0xff) return None
      val code = u8(o + 1)
      if (code == 0xff) o += 1 // fill byte before a marker
      else if (code == 0xd9) eoi = true
      else if (code == 0xd8 || code == 0x01 ||
          (code >= 0xd0 && code <= 0xd7)) o += 2 // standalone markers
      else {
        if (o + 3 >= b.length) return None
        val len = u16(o + 2)
        if (len < 2 || o + 2 + len > b.length) return None
        if (code == 0xe0 && len >= 16 &&
            java.util.Arrays.equals(
              java.util.Arrays.copyOfRange(b, o + 4, o + 9), JfifTag)) {
          jM = u8(o + 9); jm = u8(o + 10); du = u8(o + 11)
          xd = u16(o + 12); yd = u16(o + 14)
        }
        // SOF0..SOF15 minus the non-frame C4/C8/CC (DHT/JPG/DAC)
        if (code >= 0xc0 && code <= 0xcf &&
            code != 0xc4 && code != 0xc8 && code != 0xcc) {
          if (len < 8) return None
          sof = code; bits = u8(o + 4)
          h = u16(o + 5); w = u16(o + 7); nc = u8(o + 9)
        }
        o += 2 + len
        if (code == 0xda) {
          // entropy-coded data: scan to the next REAL marker (not a
          // stuffed 0xFF00, not a restart RSTn)
          var p = o
          var found = false
          while (p + 1 < b.length && !found) {
            if (u8(p) == 0xff && u8(p + 1) != 0x00 &&
                !(u8(p + 1) >= 0xd0 && u8(p + 1) <= 0xd7)) found = true
            else p += 1
          }
          if (!found) return None
          o = p
        }
      }
    }
    if (w < 0 || sof < 0 || !eoi) None
    else Some(JpegMeta(w, h, nc, bits, sof, jM, jm, du, xd, yd, eoi))
  }
}
