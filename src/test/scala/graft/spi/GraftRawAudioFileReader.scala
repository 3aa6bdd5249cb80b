package graft.spi

import java.io.{BufferedInputStream, File, FileInputStream, InputStream}
import java.net.URL

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem, UnsupportedAudioFileException}
import javax.sound.sampled.spi.AudioFileReader

/** A stub audio codec registered through the JDK's PUBLIC plug-in
  * mechanism — javax.sound.sampled.spi.AudioFileReader via
  * META-INF/services — proving the pluggable-codec seam of the audio
  * operators: a user drops a provider jar (an MP3/Opus SPI works the same
  * way) on the classpath and Audio.pcmSamples / windowFeatures /
  * vadSegments route through it with ZERO operator changes.
  *
  * Container: "GRFT" magic + little-endian 16-bit mono PCM at 8 kHz. */
class GraftRawAudioFileReader extends AudioFileReader {

  private val Magic = Array[Byte]('G', 'R', 'F', 'T')
  private val Fmt = new AudioFormat(8000f, 16, 1, true, false)

  private def checkMagic(stream: InputStream): Unit = {
    stream.mark(8)
    val hdr = new Array[Byte](4)
    val n = stream.read(hdr)
    stream.reset()
    if (n != 4 || !java.util.Arrays.equals(hdr, Magic))
      throw new UnsupportedAudioFileException("not a GRFT container")
  }

  override def getAudioFileFormat(stream: InputStream): AudioFileFormat = {
    checkMagic(stream)
    new AudioFileFormat(new AudioFileFormat.Type("GRFT", "grft"), Fmt,
      AudioSystem.NOT_SPECIFIED)
  }

  override def getAudioInputStream(stream: InputStream): AudioInputStream = {
    checkMagic(stream)
    require(stream.skip(4) == 4)
    new AudioInputStream(stream, Fmt, AudioSystem.NOT_SPECIFIED)
  }

  override def getAudioFileFormat(url: URL): AudioFileFormat = {
    val in = new BufferedInputStream(url.openStream())
    try getAudioFileFormat(in) finally in.close()
  }

  override def getAudioFileFormat(file: File): AudioFileFormat = {
    val in = new BufferedInputStream(new FileInputStream(file))
    try getAudioFileFormat(in) finally in.close()
  }

  override def getAudioInputStream(url: URL): AudioInputStream =
    getAudioInputStream(new BufferedInputStream(url.openStream()))

  override def getAudioInputStream(file: File): AudioInputStream =
    getAudioInputStream(new BufferedInputStream(new FileInputStream(file)))
}

object GraftRawAudioFileReader {
  /** Wrap samples in the GRFT container (magic + LE 16-bit PCM). */
  def containerBytes(samples: Array[Short]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(4 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(Array[Byte]('G', 'R', 'F', 'T'))
    samples.foreach(buf.putShort)
    buf.array()
  }
}
