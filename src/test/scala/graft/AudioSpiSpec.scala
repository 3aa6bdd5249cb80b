package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Audio, Multimodal}
import graft.spi.GraftRawAudioFileReader

/** The pluggable-codec contract: the audio operators decode through
  * javax.sound.sampled.AudioSystem, whose providers load from the
  * classpath by the standard ServiceLoader SPI — so real-world codecs
  * (an MP3/Opus AudioFileReader jar) plug in with NO operator change.
  * Proven here with a stub GRFT-container provider registered via
  * META-INF/services in test resources: the UNCHANGED pcmSamples /
  * windowFeatures / vadSegments paths decode it identically to the
  * JDK-native WAV route. */
class AudioSpiSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val samples: Array[Short] =
    Array.tabulate(4096)(i => (math.sin(i / 5.0) * 12000).toShort)

  private def mkBlob(id: Long, payload: Array[Byte]): Multimodal.Blob =
    Multimodal.Blob(id, "audio", payload.length.toLong, payload)

  test("the SPI provider is discovered by AudioSystem from META-INF/services") {
    val types = javax.sound.sampled.AudioSystem.getAudioFileTypes
    // the JDK enumerates WRITER types here; the READER proves itself by
    // decoding below — but the provider class must at least load via the
    // same classloader the executors use
    assert(Class.forName("graft.spi.GraftRawAudioFileReader") != null)
    assert(types.nonEmpty)
  }

  test("pcmSamples decodes the foreign container through the SPI, bit-identically to WAV") {
    val viaSpi = Audio.pcmSamples(GraftRawAudioFileReader.containerBytes(samples))
    val viaWav = Audio.pcmSamples(Audio.wavBytes(samples))
    assert(viaSpi.length == samples.length, "SPI container did not decode")
    assert(viaSpi.toSeq == samples.toSeq, "SPI decode must be sample-exact")
    assert(viaSpi.toSeq == viaWav.toSeq, "container must not affect decoded samples")
  }

  test("windowFeatures and vadSegments route through the SPI with zero operator changes") {
    val blobs = Seq(
      mkBlob(1L, GraftRawAudioFileReader.containerBytes(samples)),
      mkBlob(2L, Audio.wavBytes(samples))).toDS()
    val feats = Audio.windowFeatures(blobs, samplesPerWindow = 1024).collect()
      .groupBy(_.doc_id)
    // identical samples → identical per-window features across containers
    assert(feats(1L).map(w => (w.window_idx, w.n_samples, w.rms, w.zcr)).toSeq.sorted ==
      feats(2L).map(w => (w.window_idx, w.n_samples, w.rms, w.zcr)).toSeq.sorted)
    val segs = Audio.vadSegments(blobs, samplesPerWindow = 1024, rmsThreshold = 0.1)
      .collect().groupBy(_.doc_id)
    assert(segs(1L).map(s => (s.seg_idx, s.active, s.win_from, s.win_to)).toSeq.sorted ==
      segs(2L).map(s => (s.seg_idx, s.active, s.win_from, s.win_to)).toSeq.sorted)
  }

  test("a payload no provider recognizes still yields zero rows, not a task failure") {
    val junk = Array[Byte]('J', 'U', 'N', 'K', 1, 2, 3)
    assert(Audio.pcmSamples(junk).isEmpty)
    val blobs = Seq(mkBlob(9L, junk)).toDS()
    assert(Audio.windowFeatures(blobs).count() == 0)
  }
}
