package graft.multimodal

import java.io.ByteArrayInputStream
import java.security.MessageDigest

import javax.sound.sampled.{AudioFormat, AudioSystem}

import org.apache.spark.sql.Dataset

import graft.multimodal.Multimodal.{Blob, Frame, FrameDecoder}

/** REAL audio codec — javax.sound.sampled, which ships with the JDK, so no
  * external media libs are needed. Decodes WAV/AIFF/AU containers to
  * 16-bit signed PCM (any source encoding the JDK converts), channel-mixes
  * to mono, and exposes two consumers over the same per-partition batched
  * seam as the image path:
  *
  *  - [[WavFrameDecoder]]: the [[Multimodal.FrameDecoder]] instance —
  *    fixed-sample windows, every `stride`-th kept, md5 over the window's
  *    PCM bytes (a content hash of the DECODED samples, so re-containered
  *    audio collides).
  *  - [[Audio.windowFeatures]]: genuine DSP-lite features per window —
  *    RMS energy (full-scale-normalized) and zero-crossing rate — the
  *    speech/music/silence discriminators a curation pipeline filters on.
  *
  * Undecodable payloads yield zero rows instead of failing the task: at
  * 100 TB a corrupt blob must never kill an ingest job; count drops from
  * the per-doc window totals. Each blob's samples materialize eagerly
  * (bounded by the blob, the multimodal schema's unit of work) while the
  * partition iterator streams blob-to-blob.
  *
  * PLUGGABLE CODECS: every decode routes through AudioSystem, whose
  * providers load from the classpath by the JDK's standard ServiceLoader
  * SPI (javax.sound.sampled.spi.AudioFileReader / .FormatConversionProvider
  * named in META-INF/services). Real corpora arriving as MP3/Opus need
  * only a provider jar on the executor classpath — zero changes to any
  * operator here. AudioSpiSpec proves the seam with a stub provider for a
  * foreign container decoding bit-identically to the WAV route.
  */
object Audio {

  final case class AudioWindow(doc_id: Long, window_idx: Int, n_samples: Int,
      rms: Double, zcr: Double)

  /** Mono 16-bit little-endian PCM WAV container around raw samples,
    * written by the SAME JDK audio stack the decoder reads with — the
    * roundtrip is sample-exact, which is what lets gates synthesize
    * deterministic audio corpora whose decoded features a SQL oracle can
    * replay from the sample formula. */
  def wavBytes(samples: Array[Short], sampleRate: Float = 8000f): Array[Byte] = {
    val bytes = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(bytes.putShort)
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(bytes.array()), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Stereo 16-bit little-endian PCM WAV container (L/R interleaved
    * frames) — the multi-channel sibling of wavBytes, written by the same
    * JDK stack the channel-separated decoder reads with. */
  def wavStereoBytes(left: Array[Short], right: Array[Short],
      sampleRate: Float = 8000f): Array[Byte] = {
    require(left.length == right.length, "channel length mismatch")
    val bytes = java.nio.ByteBuffer.allocate(left.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < left.length) { bytes.putShort(left(i)); bytes.putShort(right(i)); i += 1 }
    val fmt = new AudioFormat(sampleRate, 16, 2, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(bytes.array()), fmt, left.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode to CHANNEL-SEPARATED 16-bit PCM — no downmix: one sample
    * array per channel, sample-exact for PCM containers (the channel-
    * aware path stereo feature extraction needs; pcmSamples' average
    * downmix would hide inter-channel structure). Undecodable → empty. */
  def pcmChannels(payload: Array[Byte]): Array[Array[Short]] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val base = in.getFormat
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          base.getSampleRate, 16, base.getChannels,
          base.getChannels * 2, base.getSampleRate, false)
        val pcm = AudioSystem.getAudioInputStream(target, in)
        try {
          val bytes = pcm.readAllBytes()
          val ch = target.getChannels
          val n = bytes.length / 2 / ch
          val out = Array.fill(ch)(new Array[Short](n))
          var i = 0
          while (i < n) {
            var c = 0
            while (c < ch) {
              val idx = (i * ch + c) * 2
              out(c)(i) = (((bytes(idx + 1) << 8) | (bytes(idx) & 0xff))).toShort
              c += 1
            }
            i += 1
          }
          out
        } finally pcm.close()
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => Array.empty }

  /** Decode any JDK-supported audio container to mono 16-bit samples;
    * undecodable → empty (never throws). Multi-channel mixes by average. */
  def pcmSamples(payload: Array[Byte]): Array[Short] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val base = in.getFormat
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          base.getSampleRate, 16, base.getChannels,
          base.getChannels * 2, base.getSampleRate, false)
        val pcm = AudioSystem.getAudioInputStream(target, in)
        try {
          val bytes = pcm.readAllBytes()
          val ch = target.getChannels
          val n = bytes.length / 2 / ch
          val out = new Array[Short](n)
          var i = 0
          while (i < n) {
            var acc = 0; var c = 0
            while (c < ch) {
              val idx = (i * ch + c) * 2
              acc += (bytes(idx + 1) << 8) | (bytes(idx) & 0xff)
              c += 1
            }
            out(i) = (acc / ch).toShort
            i += 1
          }
          out
        } finally pcm.close()
      } finally in.close()
    } catch { case _: Exception => Array.emptyShortArray }

  /** [[Multimodal.FrameDecoder]] over decoded PCM windows — plugs into
    * decodeFrames/sampleFrames exactly like the stub and imageio codecs. */
  final class WavFrameDecoder(samplesPerFrame: Int = 1024, stride: Int = 1)
      extends FrameDecoder {
    @transient private var digest: MessageDigest = _
    override def open(): Unit = { digest = MessageDigest.getInstance("MD5") }
    override def decode(b: Blob): Iterator[Frame] = {
      val samples = pcmSamples(b.payload)
      val n = samples.length
      (0 until (n + samplesPerFrame - 1) / samplesPerFrame).iterator
        .filter(_ % stride == 0)
        .map { wi =>
          val from = wi * samplesPerFrame
          val until = math.min(from + samplesPerFrame, n)
          val bytes = java.nio.ByteBuffer.allocate((until - from) * 2)
          var i = from
          while (i < until) { bytes.putShort(samples(i)); i += 1 }
          digest.reset()
          val hex = digest.digest(bytes.array()).map("%02x".format(_)).mkString
          Frame(b.doc_id, wi, until - from, hex)
        }
    }
  }

  final case class AudioSegment(doc_id: Long, seg_idx: Long, active: Boolean,
      win_from: Long, win_to: Long, n_windows: Long)

  /** VAD-style segmentation — the audio-curation stage that chops a long
    * recording into utterances and strips silence before transcription or
    * training. Windows classify active by an RMS threshold; consecutive
    * same-state windows collapse into runs via ONE (doc_id)-keyed sorted
    * window: a running count of state changes numbers the runs, and that
    * count doubles as seg_idx (runs are ordinal by construction) — so the
    * whole operator is one window shuffle + one run-keyed aggregation, no
    * (doc_id, active) secondary shuffle and no final ranking window.
    *
    * Output is segment-bounded (runs, not windows), so long recordings
    * leave the executors as a handful of rows; the RMS compare is on
    * bit-deterministic window features, so segmentation is reproducible
    * under any partitioning. */
  def vadSegments(blobs: Dataset[Blob], samplesPerWindow: Int = 1024,
      rmsThreshold: Double = 0.1): Dataset[AudioSegment] = {
    import blobs.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = windowFeatures(blobs, samplesPerWindow).toDF()
      .withColumn("active", col("rms") >= rmsThreshold)
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("window_idx"))
    // both window expressions share the byDoc spec → one Exchange + Sort
    w.withColumn("chg",
        when(col("active") =!= lag(col("active"), 1).over(byDoc), 1L).otherwise(0L))
      .withColumn("grp", sum(col("chg")).over(byDoc))
      .groupBy(col("doc_id"), col("active"), col("grp"))
      .agg(min(col("window_idx")).cast("long").as("win_from"),
        max(col("window_idx")).cast("long").as("win_to"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("grp").cast("long").as("seg_idx"), col("active"),
        col("win_from"), col("win_to"), col("n_windows"))
      .as[AudioSegment]
  }

  final case class AudioFp(doc_id: Long, n_windows: Int, fp: Long)

  /** ENERGY-DELTA SIGN fingerprint — the Chromaprint/Shazam family's
    * core trick reduced to its deterministic skeleton: the clip collapses
    * to per-window INTEGER energies (Σ v², exact long), and bit w of the
    * fingerprint records whether energy rose from window w to w+1. The
    * sign sequence is invariant under uniform gain (E' = s²·E exactly, so
    * every comparison is preserved — a re-mastered/volume-normalized copy
    * of the same recording collides) while distinct material diverges
    * within a few windows. One 64-bit word per clip; retrieval composes
    * with the SimHash pigeonhole machinery exactly like image
    * perceptualHashes. Integer math end-to-end — no FFT, no floats — so a
    * SQL oracle replays it bit-for-bit from the sample formula. */
  def fingerprints(blobs: Dataset[Blob], samplesPerWindow: Int = 128): Dataset[AudioFp] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.map { b =>
        val samples = pcmSamples(b.payload)
        val n = samples.length
        val nw = (n + samplesPerWindow - 1) / samplesPerWindow
        val energies = new Array[Long](nw)
        var i = 0
        while (i < n) {
          val v = samples(i).toLong
          energies(i / samplesPerWindow) += v * v
          i += 1
        }
        var fp = 0L; var w = 0
        while (w < nw - 1 && w < 63) {
          if (energies(w + 1) > energies(w)) fp |= 1L << w
          w += 1
        }
        AudioFp(b.doc_id, nw, fp)
      }
    }
  }

  /** Windowed RMS (normalized to full scale, so 1.0 = rail-to-rail) and
    * zero-crossing rate (sign changes / (n−1) consecutive pairs) — batched
    * per partition like every decode path. Exact-arithmetic per window
    * (integer sums → one sqrt/division), so results are bit-deterministic
    * under any partitioning. */
  def windowFeatures(blobs: Dataset[Blob], samplesPerWindow: Int = 1024): Dataset[AudioWindow] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.flatMap { b =>
        val samples = pcmSamples(b.payload)
        val n = samples.length
        (0 until (n + samplesPerWindow - 1) / samplesPerWindow).iterator.map { wi =>
          val from = wi * samplesPerWindow
          val until = math.min(from + samplesPerWindow, n)
          var sumSq = 0L; var crossings = 0L
          var i = from
          while (i < until) {
            val v = samples(i).toLong
            sumSq += v * v
            if (i > from && (samples(i) < 0) != (samples(i - 1) < 0)) crossings += 1
            i += 1
          }
          val len = until - from
          val rms = math.sqrt(sumSq.toDouble / len) / 32768.0
          val zcr = if (len > 1) crossings.toDouble / (len - 1) else 0.0
          AudioWindow(b.doc_id, wi, len, rms, zcr)
        }
      }
    }
  }

  final case class WavMeta(audio_format: Int, channels: Int, sample_rate: Long,
      bits: Int, data_bytes: Long)

  /** RIFF/WAVE HEADER WALK — the m_png_meta sibling for audio: fmt and
    * data chunk fields read directly from the container bytes (generic
    * chunk iteration with even-padding, exactly per the RIFF spec), with
    * NO decode — the metadata pass a media pipeline runs over petabytes
    * of audio where touching sample data would be the whole job. Returns
    * None on anything that is not a RIFF/WAVE with a fmt chunk. */
  def wavMeta(payload: Array[Byte]): Option[WavMeta] = {
    def u16(o: Int): Int = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = (payload(o) & 0xffL) | ((payload(o + 1) & 0xffL) << 8) |
      ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
    def tag(o: Int): String = new String(payload, o, 4, "US-ASCII")
    if (payload.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var fmt: Option[(Int, Int, Long, Int)] = None
    var dataBytes = -1L
    var corrupt = false
    while (!corrupt && off + 8 <= payload.length) {
      val id = tag(off)
      val size = u32(off + 4)
      // a corrupt/hostile size field must neither loop forever nor walk
      // past the buffer — stop the walk, keep whatever parsed so far.
      // A size that fits numerically but extends past the buffer is a
      // TRUNCATED container: accepting it as-is would report data_bytes
      // for bytes that are not present and inflate every derived
      // duration, so a truncated data chunk is CLAMPED to the bytes
      // actually in the buffer and the walk stops.
      if (size < 0 || off + 8 + size > payload.length.toLong) {
        if (id == "data" && size >= 0 && off + 8 <= payload.length)
          dataBytes = payload.length.toLong - (off + 8)
        corrupt = true
      } else {
        if (id == "fmt " && off + 24 <= payload.length)
          fmt = Some((u16(off + 8), u16(off + 10), u32(off + 12), u16(off + 22)))
        if (id == "data") dataBytes = size
        off += 8 + size.toInt + (size.toInt & 1) // chunks pad to even
      }
    }
    fmt.collect { case (af, ch, sr, bits) if dataBytes >= 0 =>
      WavMeta(af, ch, sr, bits, dataBytes)
    }
  }
}
