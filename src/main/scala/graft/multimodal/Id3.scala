package graft.multimodal

/** ID3v2.3 TAG WALKER — the audio sibling of [[Exif]]: the tag block
  * prepended to virtually every MP3 in a crawled audio corpus, walked by
  * a real frame iterator (syncsafe header size, 4-byte frame ids,
  * v2.3 big-endian frame sizes, the encoding byte on text frames,
  * padding stop) with NO audio decode — the title/artist/album/duration
  * census an audio pipeline runs before routing anything to a decoder.
  *
  * Robustness contract (the wavMeta/Jpeg/Exif clamp discipline): every
  * offset is bounds-checked against both the buffer and the declared tag
  * size, the walk is step-bounded, and a truncated or crafted frame size
  * returns None rather than reading past either boundary.
  *
  * The companion [[build]] assembles a spec-conforming v2.3 tag (the
  * injector pattern — no vendored tag library under the codec-SPI
  * boundary) so the m_id3_meta gate exercises writer + walker under a
  * formula-replay oracle.
  */
object Id3 {

  final case class Id3Meta(
      version: Int, tagBytes: Long, nFrames: Int,
      title: String, artist: String, album: String,
      track: Long, lenMs: Long)

  private val MaxFrames = 4096

  /** Parse an ID3v2.3 tag at the head of `b`; None on any corruption. */
  def meta(b: Array[Byte]): Option[Id3Meta] = {
    def u8(o: Int): Int = b(o) & 0xff
    if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3') return None
    val ver = u8(3)
    if (ver != 3 || u8(4) != 0) return None // v2.3, no revision
    if ((u8(5) & 0x80) != 0) return None    // unsynchronisation unsupported
    // syncsafe 28-bit size: 4 bytes of 7 bits, high bit must be clear
    if ((u8(6) | u8(7) | u8(8) | u8(9)) >= 0x80) return None
    val size = (u8(6) << 21) | (u8(7) << 14) | (u8(8) << 7) | u8(9)
    val end = 10 + size
    if (end > b.length) return None
    var o = 10
    var n = 0
    var title: String = null; var artist: String = null; var album: String = null
    var track = -1L; var lenMs = -1L
    while (o + 10 <= end && u8(o) != 0) { // a zero byte starts the padding
      n += 1
      if (n > MaxFrames) return None
      val id = new String(b, o, 4, "ISO-8859-1")
      if (!id.forall(c => (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')))
        return None
      // v2.3 frame size is PLAIN big-endian 32-bit (syncsafe arrived in v2.4)
      val fsz = (u8(o + 4).toLong << 24) | (u8(o + 5) << 16) |
        (u8(o + 6) << 8) | u8(o + 7)
      if (fsz < 0 || o + 10 + fsz > end) return None
      if (id.startsWith("T") && fsz >= 1) {
        if (u8(o + 10) != 0) return None // encoding 0 = ISO-8859-1 only
        val text = new String(b, o + 11, fsz.toInt - 1, "ISO-8859-1")
        id match {
          case "TIT2" => title = text
          case "TPE1" => artist = text
          case "TALB" => album = text
          case "TRCK" => track = text.toLongOption.getOrElse(return None)
          case "TLEN" => lenMs = text.toLongOption.getOrElse(return None)
          case _      => ()
        }
      }
      o += 10 + fsz.toInt
    }
    if (title == null || artist == null) None
    else Some(Id3Meta(ver, end.toLong, n, title, artist, album, track, lenMs))
  }

  /** Assemble a spec-conforming ID3v2.3 tag block (header + the five
    * text frames + `padding` zero bytes). */
  def build(title: String, artist: String, album: String,
      track: Long, lenMs: Long, padding: Int = 16): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def frame(id: String, text: String): Unit = {
      val payload = text.getBytes("ISO-8859-1")
      val fsz = payload.length + 1 // + encoding byte
      bos.write(id.getBytes("ISO-8859-1"))
      bos.write(fsz >> 24); bos.write((fsz >> 16) & 0xff)
      bos.write((fsz >> 8) & 0xff); bos.write(fsz & 0xff)
      bos.write(0); bos.write(0) // frame flags
      bos.write(0)               // encoding: ISO-8859-1
      bos.write(payload)
    }
    frame("TIT2", title); frame("TPE1", artist); frame("TALB", album)
    frame("TRCK", track.toString); frame("TLEN", lenMs.toString)
    val body = bos.toByteArray
    val size = body.length + padding
    val out = new java.io.ByteArrayOutputStream()
    out.write('I'); out.write('D'); out.write('3')
    out.write(3); out.write(0); out.write(0) // v2.3.0, no flags
    out.write((size >> 21) & 0x7f); out.write((size >> 14) & 0x7f)
    out.write((size >> 7) & 0x7f); out.write(size & 0x7f)
    out.write(body)
    out.write(new Array[Byte](padding))
    out.toByteArray
  }
}
