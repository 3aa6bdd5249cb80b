package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Audio, Multimodal}

/** Second codec for the swap test: one frame per blob, byte count as the
  * "feature". Top-level so serializing it does not drag the spec along. */
class CountingDecoder extends Multimodal.FrameDecoder {
  @transient private var opened = false
  override def open(): Unit = { opened = true }
  override def decode(b: Multimodal.Blob): Iterator[Multimodal.Frame] = {
    require(opened, "decode before open(): per-partition init contract broken")
    Iterator.single(Multimodal.Frame(b.doc_id, 0, b.payload.length, s"len-${b.payload.length}"))
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("ImageIoFrameDecoder: real JDK codec decodes PNG fixtures; corrupt blobs yield zero frames, not failures") {
    import java.awt.image.BufferedImage
    // tiny in-memory fixture: 3x2 PNG with known ARGB pixels
    def png(seed: Int): Array[Byte] = {
      val img = new BufferedImage(3, 2, BufferedImage.TYPE_INT_ARGB)
      for (x <- 0 until 3; y <- 0 until 2)
        img.setRGB(x, y, 0xFF000000 | (seed * 31 + x * 7 + y * 13))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    // expected md5 of the row-major ARGB raster, computed independently
    def expectedMd5(seed: Int): String = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png(seed)))
      val argb = img.getRGB(0, 0, 3, 2, null, 0, 3)
      val bb = java.nio.ByteBuffer.allocate(argb.length * 4)
      argb.foreach(bb.putInt)
      java.security.MessageDigest.getInstance("MD5").digest(bb.array())
        .map("%02x".format(_)).mkString
    }
    val blobs = spark.createDataset(Seq(
      Multimodal.Blob(1L, "image/png", png(1).length.toLong, png(1)),
      Multimodal.Blob(2L, "image/png", png(2).length.toLong, png(2)),
      Multimodal.Blob(3L, "text/plain", 9L, "not image".getBytes("UTF-8")) // undecodable
    ))
    val frames = Multimodal.decodeFrames(blobs, new Multimodal.ImageIoFrameDecoder())
      .collect().sortBy(_.doc_id)
    assert(frames.map(_.doc_id).toSeq == Seq(1L, 2L), "corrupt blob must yield zero frames")
    assert(frames.forall(f => f.frame_idx == 0 && f.frame_bytes == 6), "3x2 image = 6 pixels, one frame")
    assert(frames(0).frame_md5 == expectedMd5(1) && frames(1).frame_md5 == expectedMd5(2),
      "frame hash must be the decoded-raster content hash")
    assert(frames(0).frame_md5 != frames(1).frame_md5)

    // the config seam: sampleFrames flips codecs on the session conf and
    // the gate default remains the deterministic stub
    try {
      spark.conf.set(Multimodal.DecoderConf, "imageio")
      val viaConf = Multimodal.sampleFrames(blobs).collect().sortBy(_.doc_id)
      assert(viaConf.map(_.frame_md5).toSeq == frames.map(_.frame_md5).toSeq)
    } finally spark.conf.unset(Multimodal.DecoderConf)
    val stub = Multimodal.sampleFrames(blobs).collect()
    assert(stub.map(_.doc_id).distinct.sorted.toSeq == Seq(1L, 2L, 3L),
      "default stub path decodes every payload, including non-images")
  }

  test("MjpegFrameDecoder: a concatenated-JPEG stream decodes as a FRAME SEQUENCE — temporal indices, per-frame content hashes, stride") {
    import java.awt.image.BufferedImage
    // fixture "video": 4 distinct 4x3 JPEG stills back-to-back in one blob
    def jpeg(seed: Int): Array[Byte] = {
      val img = new BufferedImage(4, 3, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 4; y <- 0 until 3)
        img.setRGB(x, y, (seed * 997 + x * 31 + y * 57) & 0xFFFFFF)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos))
      bos.toByteArray
    }
    val stream = (0 until 4).map(jpeg).reduce(_ ++ _)
    val blobs = spark.createDataset(Seq(
      Multimodal.Blob(1L, "video/x-motion-jpeg", stream.length.toLong, stream),
      Multimodal.Blob(2L, "text/plain", 8L, "no video".getBytes("UTF-8")) // undecodable
    ))
    val frames = Multimodal.decodeFrames(blobs, new Multimodal.MjpegFrameDecoder())
      .collect().sortBy(f => (f.doc_id, f.frame_idx))
    assert(frames.forall(_.doc_id == 1L), "non-video blob must yield zero frames")
    assert(frames.length == 4, s"all 4 temporal frames must decode, got ${frames.length}")
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 1, 2, 3), "frame_idx is the temporal index")
    assert(frames.forall(_.frame_bytes == 12), "4x3 frame = 12 decoded pixels")
    assert(frames.map(_.frame_md5).distinct.length == 4, "distinct stills → distinct content hashes")
    // content-hash determinism: a second decode reproduces the hashes
    val again = Multimodal.decodeFrames(blobs, new Multimodal.MjpegFrameDecoder())
      .collect().sortBy(f => (f.doc_id, f.frame_idx))
    assert(again.map(_.frame_md5).toSeq == frames.map(_.frame_md5).toSeq)
    // temporal stride: keep frames 0 and 2 only, hashes unchanged
    val strided = Multimodal.decodeFrames(blobs, new Multimodal.MjpegFrameDecoder(stride = 2))
      .collect().sortBy(_.frame_idx)
    assert(strided.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(strided.map(_.frame_md5).toSeq == Seq(frames(0).frame_md5, frames(2).frame_md5))
    // and the config seam reaches it (sampleFrames' default stride is 4,
    // so pass stride=1 to see all four temporal frames)
    try {
      spark.conf.set(Multimodal.DecoderConf, "mjpeg")
      assert(Multimodal.sampleFrames(blobs, stride = 1).collect().length == 4)
    } finally spark.conf.unset(Multimodal.DecoderConf)
  }

  test("MjpegFrameDecoder: an EXIF APP1 segment embedding a complete thumbnail JPEG never splits its frame") {
    import java.awt.image.BufferedImage
    def jpeg(seed: Int, size: Int): Array[Byte] = {
      val img = new BufferedImage(size, size, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until size; y <- 0 until size)
        img.setRGB(x, y, (seed * 997 + x * 31 + y * 57) & 0xFFFFFF)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos))
      bos.toByteArray
    }
    // splice an EXIF-style APP1 segment right after SOI whose payload is a
    // COMPLETE nested JPEG (its own SOI…EOI) — a raw FF D8/FF D9 scan
    // would close the enclosing frame at the thumbnail's EOI and lose it
    def withExifThumb(main: Array[Byte], thumb: Array[Byte]): Array[Byte] = {
      assert((main(0) & 0xff) == 0xff && (main(1) & 0xff) == 0xd8)
      val exifHeader = "Exif\u0000\u0000".getBytes("ISO-8859-1")
      val payloadLen = 2 + exifHeader.length + thumb.length // includes the length bytes
      assert(payloadLen <= 0xffff)
      val seg = Array[Byte](0xff.toByte, 0xe1.toByte,
        ((payloadLen >> 8) & 0xff).toByte, (payloadLen & 0xff).toByte) ++ exifHeader ++ thumb
      main.take(2) ++ seg ++ main.drop(2)
    }
    val frames = Seq(withExifThumb(jpeg(1, 8), jpeg(9, 4)), jpeg(2, 8), jpeg(3, 8))
    val stream = frames.reduce(_ ++ _)
    val blobs = spark.createDataset(Seq(
      Multimodal.Blob(7L, "video/x-motion-jpeg", stream.length.toLong, stream)))
    val got = Multimodal.decodeFrames(blobs, new Multimodal.MjpegFrameDecoder())
      .collect().sortBy(_.frame_idx)
    assert(got.length == 3,
      s"EXIF-bearing stream must keep all 3 temporal frames, got ${got.length}")
    assert(got.map(_.frame_idx).toSeq == Seq(0, 1, 2))
    assert(got.forall(_.frame_bytes == 64), "8x8 mains decode — never the 4x4 thumbnail")
    // the EXIF copy decodes to the same pixels as its plain original
    val plain = Multimodal.decodeFrames(spark.createDataset(Seq(
        Multimodal.Blob(8L, "video/x-motion-jpeg", 0L, jpeg(1, 8)))),
      new Multimodal.MjpegFrameDecoder()).collect()
    assert(plain.length == 1 && got(0).frame_md5 == plain(0).frame_md5,
      "metadata must not change the decoded raster hash")
  }

  test("perceptual image dedup: re-encodings of one picture collide at Hamming <= 3, distinct pictures never") {
    import java.awt.image.BufferedImage
    // one smooth gradient picture encoded twice (lossless png + lossy jpeg)
    // and its inverse as the distinct picture
    def pic(invert: Boolean): BufferedImage = {
      val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 64; y <- 0 until 64) {
        val v = (x * 3 + y) & 0xff
        val g = if (invert) 255 - v else v
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      img
    }
    def enc(img: BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos))
      bos.toByteArray
    }
    val blobs = spark.createDataset(Seq(
      Multimodal.Blob(1L, "image/png", 0L, enc(pic(false), "png")),
      Multimodal.Blob(2L, "image/jpeg", 0L, enc(pic(false), "jpg")), // re-encoding of 1
      Multimodal.Blob(3L, "image/png", 0L, enc(pic(true), "png")),   // different picture
      Multimodal.Blob(4L, "text/plain", 0L, "not an image".getBytes("UTF-8"))
    ))
    val hashes = Multimodal.perceptualHashes(blobs)
    assert(hashes.count() == 3, "undecodable blob must yield no hash")
    // the retrieval machinery is the SAME pigeonhole path text SimHash uses
    val pairs = graft.dedup.SimHashDedup.pairsFromSignatures(hashes.toDF(), "doc_id")
      .as[(Long, Long, Int)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)),
      s"only the re-encoded pair may collide, got ${pairs.toSeq}")
    assert(pairs.head._3 <= 3)
    // determinism: hashing twice reproduces the signatures exactly
    val h1 = hashes.collect().map(h => h.doc_id -> h.simhash).toMap
    val h2 = Multimodal.perceptualHashes(blobs).collect().map(h => h.doc_id -> h.simhash).toMap
    assert(h1 == h2)
    // and the distinct picture is FAR from both encodings (not a near miss)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h1(1L), h1(3L)) > 10 && ham(h1(2L), h1(3L)) > 10)
  }

  test("perceptual-hash hot-signature cap: m copies of one image emit m-1 star pairs, not m²/2") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 32; y <- 0 until 32) {
      val g = (x * 7 + y) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val bytes = bos.toByteArray
    val m = 200
    val blobs = spark.createDataset(Seq.tabulate(m)(i =>
      Multimodal.Blob(10L + i, "image/png", 0L, bytes)))
    val hashes = Multimodal.perceptualHashes(blobs)
    // identical bytes → identical aHash → one hamming-0 clique; the shared
    // SimHash retrieval path must cap it at m-1 rep-star edges
    val pairs = graft.dedup.SimHashDedup.pairsFromSignatures(hashes.toDF(), "doc_id")
      .as[(Long, Long, Int)].collect()
    assert(pairs.length == m - 1, s"expected ${m - 1} star edges, got ${pairs.length}")
    assert(pairs.forall(p => p._1 == 10L && p._3 == 0), "edges must be rep-star at hamming 0")
  }

  test("payloads are pure ASCII (byte offsets == char offsets, oracle precondition)") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val nonAscii = d.filter(length(col("text")) =!= length(encode(col("text"), "UTF-8"))).count()
    assert(nonAscii == 0)
  }

  test("no empty payloads (zero-norm feature precondition: Spark NULL cosine vs DuckDB NaN diverge)") {
    // an all-zero histogram would rank last in Spark (NULL under cos DESC)
    // but FIRST in the DuckDB oracle (0/0 = NaN sorts above all reals) —
    // m_features_knn's oracle is valid only while every payload is non-empty
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val d = Tables.documents(spark, s"/root/testdata/$sf")
      assert(d.filter(length(col("text")) === 0).count() == 0, s"empty doc in $sf")
    }
  }

  test("sampleFrames: frame math, determinism, partition independence") {
    val blobs = Seq(
      Multimodal.Blob(1L, "t", 200L, Array.tabulate(200)(_.toByte)),
      Multimodal.Blob(2L, "t", 10L, Array.tabulate(10)(_.toByte))).toDS()
    val frames = Multimodal.sampleFrames(blobs, frameSize = 64, stride = 4).collect()
    // doc 1: 200 bytes -> frames 0..3, stride 4 keeps frame 0 (64B)
    // doc 2: 10 bytes -> frame 0 only (10B)
    val byDoc = frames.groupBy(_.doc_id)
    assert(byDoc(1L).map(f => (f.frame_idx, f.frame_bytes)).toSet == Set((0, 64)))
    assert(byDoc(2L).map(f => (f.frame_idx, f.frame_bytes)).toSet == Set((0, 10)))
    val repart = Multimodal.sampleFrames(blobs.repartition(7), 64, 4).collect()
    assert(frames.map(f => (f.doc_id, f.frame_idx, f.frame_md5)).toSet ==
      repart.map(f => (f.doc_id, f.frame_idx, f.frame_md5)).toSet)
  }

  test("byteHistogram: 16 L1-normalized bins, exact vs reference, partition-independent") {
    val payload = "AAAa 01!".getBytes("UTF-8") // bins: 'A'=0x41>>4=4, 'a'=0x61>>4=6, ' '=2, '0','1'=3, '!'=2
    val blobs = Seq(Multimodal.Blob(1L, "t", payload.length.toLong, payload)).toDS()
    val f = Multimodal.byteHistogram(blobs).collect().head.features.toSeq
    assert(f.length == 16 && math.abs(f.sum - 1.0) < 1e-12)
    assert(f(4) == 3.0 / 8 && f(6) == 1.0 / 8 && f(2) == 2.0 / 8 && f(3) == 2.0 / 8)
    val many = Seq.tabulate(20)(i => Multimodal.Blob(i.toLong, "t", 5L, s"doc$i!".getBytes)).toDS()
    val a = Multimodal.byteHistogram(many).collect().map(x => x.doc_id -> x.features.toSeq).toMap
    val b = Multimodal.byteHistogram(many.repartition(7)).collect().map(x => x.doc_id -> x.features.toSeq).toMap
    assert(a == b)
  }

  test("FrameDecoder is swappable: a second codec runs through the same pipeline, open() runs per partition") {
    // CountingDecoder (top of file) is a different decode entirely, same
    // plumbing. open() must have run executor-side before any decode (the
    // per-partition-init contract a real codec's native-lib load depends on).
    val blobs = Seq(
      Multimodal.Blob(1L, "t", 200L, Array.tabulate(200)(_.toByte)),
      Multimodal.Blob(2L, "t", 10L, Array.tabulate(10)(_.toByte))).toDS()
    val out = Multimodal.decodeFrames(blobs.repartition(5), new CountingDecoder)
      .collect().map(f => (f.doc_id, f.frame_bytes, f.frame_md5)).toSet
    assert(out == Set((1L, 200, "len-200"), (2L, 10, "len-10")))
    // and the stub path is literally the same pipeline under the trait
    val viaTrait = Multimodal.decodeFrames(blobs, new Multimodal.StubFrameDecoder(64, 4))
      .collect().map(f => (f.doc_id, f.frame_idx, f.frame_md5)).toSet
    val viaHelper = Multimodal.sampleFrames(blobs, 64, 4)
      .collect().map(f => (f.doc_id, f.frame_idx, f.frame_md5)).toSet
    assert(viaTrait == viaHelper)
  }

  test("shardAssign: first-fit without splitting; oversized blob gets its own shard") {
    val blobs = Seq(
      ("a", 1L, 60L), ("a", 2L, 30L),   // fit together in shard 0 (90 ≤ 100)
      ("a", 3L, 20L),                   // 90+20 > 100 → opens shard 1
      ("a", 4L, 250L),                  // oversized → alone in shard 2, offset 0
      ("a", 5L, 10L),                   // 250 > 0 and 250+10 > 100 → shard 3
      ("b", 9L, 40L)                    // independent group restarts at shard 0
    ).toDF("source", "doc_id", "n_bytes")
    val got = Multimodal.shardAssign(blobs, "source", budgetBytes = 100L)
      .collect().map(s => s.doc_id -> ((s.shard_idx, s.offset_bytes))).toMap
    assert(got(1L) == ((0L, 0L)) && got(2L) == ((0L, 60L)))
    assert(got(3L) == ((1L, 0L)))
    assert(got(4L) == ((2L, 0L)), "a blob over budget must still be placed, alone")
    assert(got(5L) == ((3L, 0L)))
    assert(got(9L) == ((0L, 0L)))
  }

  test("sampleFrames stride keeps every 4th frame on long payloads") {
    val blobs = Seq(Multimodal.Blob(1L, "t", 1000L, Array.tabulate(1000)(_.toByte))).toDS()
    val idx = Multimodal.sampleFrames(blobs, 64, 4).collect().map(_.frame_idx).sorted
    // 1000 bytes -> 16 frames (0..15), stride 4 -> 0, 4, 8, 12
    assert(idx.toSeq == Seq(0, 4, 8, 12))
  }

  /** Mono 16-bit little-endian PCM WAV from raw samples, via the same JDK
    * audio stack the decoder uses — the roundtrip is sample-exact. */
  private def wav(samples: Array[Short], sampleRate: Float = 8000f): Array[Byte] = {
    import javax.sound.sampled._
    val bytes = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(bytes.putShort)
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes.array()), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("Audio: real JDK WAV decode — windowed RMS/ZCR exact, corrupt blobs yield zero rows") {
    // 2048 samples: a loud square-ish tone then digital silence
    val tone = Array.tabulate[Short](1024)(i => if ((i / 8) % 2 == 0) 16384 else -16384)
    val samples = tone ++ Array.fill[Short](1024)(0)
    val blobs = Seq(
      Multimodal.Blob(1L, "audio/wav", 0L, wav(samples)),
      Multimodal.Blob(2L, "text/plain", 9L, "not audio".getBytes("UTF-8"))).toDS()

    val w = Audio.windowFeatures(blobs, samplesPerWindow = 1024)
      .collect().sortBy(x => (x.doc_id, x.window_idx))
    assert(w.map(_.doc_id).distinct.toSeq == Seq(1L), "corrupt blob must yield zero windows")
    assert(w.length == 2 && w.forall(_.n_samples == 1024))
    // window 0: replicate the decoder's integer math for the exact value
    val sumSq = tone.map(v => v.toLong * v.toLong).sum
    assert(w(0).rms == math.sqrt(sumSq.toDouble / 1024) / 32768.0)
    val crossings = (1 until 1024).count(i => (tone(i) < 0) != (tone(i - 1) < 0))
    assert(w(0).zcr == crossings.toDouble / 1023)
    assert(w(0).zcr > 0.05 && w(0).rms > 0.4, "tone window must read loud and oscillating")
    // window 1: silence is exactly zero on both features
    assert(w(1).rms == 0.0 && w(1).zcr == 0.0)

    // the FrameDecoder seam: windows hash deterministically, config selects it
    val f1 = Multimodal.decodeFrames(blobs, new Audio.WavFrameDecoder(1024)).collect()
    val f2 = Multimodal.decodeFrames(blobs.repartition(4), new Audio.WavFrameDecoder(1024))
      .collect()
    assert(f1.map(f => (f.doc_id, f.frame_idx, f.frame_md5)).sortBy(_._2).toSeq ==
      f2.map(f => (f.doc_id, f.frame_idx, f.frame_md5)).sortBy(_._2).toSeq)
    assert(f1.length == 2 && f1.map(_.frame_md5).distinct.length == 2)
    assert(Multimodal.decoderFor("wav", 1024, 1).isInstanceOf[Audio.WavFrameDecoder])
  }

  test("frameHistograms: every consecutive frame, exact counts incl. short tail, partition-independent") {
    // 2-byte frames: "AAx" → frame0 = "AA" (bin 4 × 2), frame1 = "x" (bin 7 × 1)
    val blobs = Seq(Multimodal.Blob(1L, "t", 3L, "AAx".getBytes("UTF-8"))).toDS()
    val fh = Multimodal.frameHistograms(blobs, frameSize = 2).collect()
      .map(f => f.frame_idx -> f.counts.toSeq).toMap
    assert(fh.keySet == Set(0, 1))
    assert(fh(0)(4) == 2L && fh(0).sum == 2L)
    assert(fh(1)(7) == 1L && fh(1).sum == 1L)
    // a scene change between frames is a large L1 step; within-scene is 0
    val scenes = ("A" * 128) + ("z" * 128) // two 64-byte frames per scene
    val sb = Seq(Multimodal.Blob(2L, "t", scenes.length.toLong, scenes.getBytes)).toDS()
    val hs = Multimodal.frameHistograms(sb).collect().sortBy(_.frame_idx).map(_.counts.toSeq)
    def l1(a: Seq[Long], b: Seq[Long]) = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
    assert(l1(hs(0), hs(1)) == 0L && l1(hs(2), hs(3)) == 0L, "within-scene frames identical")
    assert(l1(hs(1), hs(2)) == 128L, "scene boundary moves every byte across bins")
    val many = Seq.tabulate(20)(i => Multimodal.Blob(i.toLong, "t", 200L, ("f" * 200).getBytes)).toDS()
    val a = Multimodal.frameHistograms(many).collect().map(f => (f.doc_id, f.frame_idx) -> f.counts.toSeq).toMap
    val b = Multimodal.frameHistograms(many.repartition(7)).collect().map(f => (f.doc_id, f.frame_idx) -> f.counts.toSeq).toMap
    assert(a == b)
  }

  test("vadSegments: contiguous alternating runs that exactly match the planted envelope") {
    val segs = graft.queries.Modal.mVad(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .groupBy(_._1)
    assert(segs.nonEmpty)
    for ((id, ss0) <- segs) {
      val ss = ss0.sortBy(_._2)
      // contiguous cover from window 0, states strictly alternate
      assert(ss.head._4 == 0, s"doc $id first segment must start at window 0")
      ss.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._4 == a._5 + 1, s"doc $id segments not contiguous")
          assert(a._3 != b._3, s"doc $id same-state segments not collapsed")
        case _ =>
      }
      // the (id + wi) % 3 envelope: silence runs are single windows,
      // active runs at most two — anything else means the threshold or
      // the island collapse misfired
      ss.foreach { case (_, _, active, from, to, n) =>
        assert(n == to - from + 1)
        if (active) assert(n <= 2, s"doc $id active run of $n windows")
        else assert(n == 1, s"doc $id silent run of $n windows")
      }
    }
  }

  test("stereo WAV roundtrip: pcmChannels is sample-exact per channel; pcmSamples downmix averages") {
    val left = Array.tabulate(777)(i => ((i * 131) % 4001 - 2000).toShort)
    val right = Array.tabulate(777)(i => ((i * 257) % 4001 - 2000).toShort)
    val wav = graft.multimodal.Audio.wavStereoBytes(left, right)
    val chans = graft.multimodal.Audio.pcmChannels(wav)
    assert(chans.length == 2, s"expected 2 channels, got ${chans.length}")
    assert(chans(0).toSeq == left.toSeq, "left channel must roundtrip sample-exact")
    assert(chans(1).toSeq == right.toSeq, "right channel must roundtrip sample-exact")
    // the mono path averages the interleaved frame — channel structure is
    // gone, which is exactly why the stereo gate uses pcmChannels
    val mono = graft.multimodal.Audio.pcmSamples(wav)
    assert(mono.length == left.length)
    assert(mono.toSeq == left.indices.map(i => ((left(i) + right(i)) / 2).toShort),
      "mono downmix must be the frame average")
    // garbage never throws, reports no channels
    assert(graft.multimodal.Audio.pcmChannels(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("wavMeta: a truncated container clamps data_bytes to the bytes present instead of reporting full length") {
    val full = wav(Array.tabulate[Short](1024)(i => (i % 100).toShort))
    val meta = graft.multimodal.Audio.wavMeta(full).get
    assert(meta.data_bytes == 2048L, "intact file reports the full data chunk")
    // cut mid-data: the data chunk's SIZE field still says 2048 and fits
    // numerically within the buffer, but the payload runs past the end —
    // the walker must clamp to the bytes actually present, never report
    // 2048 (which would inflate every derived duration)
    val dataOff = {
      // locate the data chunk the same way the walker does
      var off = 12; var found = -1
      while (found < 0 && off + 8 <= full.length) {
        if (new String(full, off, 4, "US-ASCII") == "data") found = off
        else off += 8 + ((full(off + 4) & 0xff) | ((full(off + 5) & 0xff) << 8) |
          ((full(off + 6) & 0xff) << 16) | ((full(off + 7) & 0xff) << 24))
      }
      found
    }
    assert(dataOff > 0)
    val cut = full.take(dataOff + 8 + 500) // 500 of 2048 data bytes survive
    val tm = graft.multimodal.Audio.wavMeta(cut).get
    assert(tm.data_bytes == 500L,
      s"truncated file must report the 500 bytes present, got ${tm.data_bytes}")
    assert(tm.sample_rate == meta.sample_rate && tm.channels == meta.channels,
      "fmt metadata parsed before the truncation point is kept")
    // cut INSIDE the data chunk header: nothing data-sized parses; None
    assert(graft.multimodal.Audio.wavMeta(full.take(dataOff + 4)).isEmpty)
  }

  test("Jpeg.meta: real JDK-written JPEG parses dims/JFIF exactly; truncation and corruption return None, never over-read") {
    import graft.multimodal.Jpeg
    val img = new java.awt.image.BufferedImage(20, 13,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 13; x <- 0 until 20)
      img.getRaster.setSample(x, y, 0, (x * 13 + y) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpg = bos.toByteArray
    val m = Jpeg.meta(jpg).get
    assert(m.width == 20 && m.height == 13, "SOF dims big-endian at +7/+5")
    assert(m.components == 1 && m.bits == 8, "grayscale baseline frame")
    assert(m.sofCode == 0xc0, "JDK writer emits baseline SOF0")
    assert(m.jfifMajor == 1 && m.jfifMinor == 2, "JFIF 1.02 pinned by the JDK writer")
    assert(m.densityUnit == 0 && m.xDensity == 1 && m.yDensity == 1,
      "aspect-ratio density 1x1")
    assert(m.hasEoi)

    // cut before EOI: the walker must notice the missing trailer, not
    // report a complete file (a petabyte census keys repair jobs on this)
    assert(Jpeg.meta(jpg.dropRight(1)).isEmpty)
    // cut mid-SOF: bounds check, not an ArrayIndexOutOfBounds
    val sofAt = jpg.indices.find(i =>
      (jpg(i) & 0xff) == 0xff && (jpg(i + 1) & 0xff) == 0xc0).get
    assert(Jpeg.meta(jpg.take(sofAt + 6)).isEmpty)
    // not a JPEG at all
    assert(Jpeg.meta(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(Jpeg.meta(Array.empty[Byte]).isEmpty)
  }

  test("Jpeg.meta: stuffed 0xFF00 and RSTn bytes inside the entropy scan never terminate it; SOF2 reports progressive") {
    import graft.multimodal.Jpeg
    // hand-built container: the walker reads structure only (no Huffman),
    // so a fake scan exercises the stuffed-byte/restart skip logic exactly
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] = {
      val len = payload.length + 2
      Array(0xff.toByte, marker.toByte, (len >> 8).toByte, (len & 0xff).toByte) ++ payload
    }
    val app0 = seg(0xe0, "JFIF".getBytes("ISO-8859-1") ++ Array[Byte](
      0, 1, 2, 0, 0, 1, 0, 1, 0, 0))
    val sof2 = seg(0xc2, Array[Byte](8, 0, 9, 0, 17, 1, 0x11, 0)) // 17x9 progressive, 1 comp
    val sos = seg(0xda, Array[Byte](1, 0, 0, 0, 63, 0))
    val scan = Array[Byte](
      0x12, 0xff.toByte, 0x00, 0x34,            // stuffed byte: NOT a marker
      0xff.toByte, 0xd3.toByte, 0x56,           // RST3: scan continues
      0xff.toByte, 0x00, 0x78)                  // second stuffed byte
    val whole = Array(0xff.toByte, 0xd8.toByte) ++ app0 ++ sof2 ++ sos ++
      scan ++ Array(0xff.toByte, 0xd9.toByte)
    val m = Jpeg.meta(whole).get
    assert(m.width == 17 && m.height == 9 && m.components == 1)
    assert(m.sofCode == 0xc2, "progressive SOF2 surfaces for codec routing")
    assert(m.hasEoi, "the scan skip must land on the real EOI, not a stuffed byte")
    // same container without the EOI: the scan runs off the end -> None
    assert(Jpeg.meta(whole.dropRight(2)).isEmpty)
  }

  test("Exif: builder->walker roundtrip in BOTH byte orders; crafted counts/offsets and truncation return None") {
    import graft.multimodal.{Exif, Jpeg}
    val dt = "2026:08:05 14:00:00"
    for (little <- Seq(true, false)) {
      val app1 = Exif.build(little, orientation = 6, xresNum = 300L,
        xresDen = 4L, dateTime = dt, pixelW = 640L, pixelH = 480L)
      // wrap in a minimal JPEG shell and walk through meta()
      val shell = Array(0xff.toByte, 0xd8.toByte) ++ app1 ++
        Array(0xff.toByte, 0xd9.toByte)
      val m = Exif.meta(shell).get
      assert(m.byteOrder == (if (little) "II" else "MM"))
      assert(m.orientation == 6 && m.xresNum == 300L && m.xresDen == 4L)
      assert(m.dateTime == dt, "ASCII payload at offset, NUL stripped")
      assert(m.pixelW == 640L && m.pixelH == 480L, "sub-IFD hop resolved")
      assert(m.ifd0Entries == 4)

      val tiff = app1.drop(4 + 6) // strip marker+len+"Exif\\0\\0"
      assert(Exif.fromTiff(tiff).isDefined)
      // truncations into every needed region: never a crash, always a
      // clean None (cutting only the trailing unread next-IFD pointer
      // still parses — the walker reads exactly what it needs)
      for (cut <- Seq(4, 8, 20, 60, 80, 110))
        assert(Exif.fromTiff(tiff.take(cut)).isEmpty, s"cut=$cut")
      assert(Exif.fromTiff(tiff.take(116)).isDefined,
        "all referenced bytes present: the unread tail is not required")
      // crafted IFD entry count (65535): clamped, not walked off the end
      val crafted = tiff.clone()
      if (little) { crafted(8) = 0xff.toByte; crafted(9) = 0xff.toByte }
      else { crafted(8) = 0xff.toByte; crafted(9) = 0xff.toByte }
      assert(Exif.fromTiff(crafted).isEmpty)
      // crafted RATIONAL offset past the buffer: bounds check -> None
      val badRat = tiff.clone()
      val ratPtr = 10 + 12 + 8 // IFD0 + 1 entry + tag/type/count of XResolution
      badRat(ratPtr) = 0x7f; badRat(ratPtr + 1) = 0x7f.toByte
      badRat(ratPtr + 2) = 0x7f.toByte; badRat(ratPtr + 3) = 0x7f.toByte
      assert(Exif.fromTiff(badRat).isEmpty)
    }
    // a real spliced JPEG keeps BOTH walkers working (the gate's dims_match)
    val img = new java.awt.image.BufferedImage(20, 13,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val spliced = Exif.spliceApp1(bos.toByteArray,
      Exif.build(little = true, 1, 72L, 1L, dt, 20L, 13L))
    assert(Jpeg.meta(spliced).exists(j => j.width == 20 && j.height == 13))
    assert(Exif.meta(spliced).exists(e => e.pixelW == 20L && e.pixelH == 13L))
    // no EXIF present: walk reaches the scan and declines
    assert(Exif.meta(bos.toByteArray).isEmpty)
  }

  test("Id3: builder->walker roundtrip; crafted sizes, bad ids, wrong versions and truncation return None") {
    import graft.multimodal.Id3
    val tag = Id3.build("My Title", "An Artist", "The Album", 7L, 31000L)
    val withAudio = tag ++ Array.fill[Byte](64)(0x55) // walker must stop at the tag
    val m = Id3.meta(withAudio).get
    assert(m.version == 3 && m.nFrames == 5)
    assert(m.title == "My Title" && m.artist == "An Artist" && m.album == "The Album")
    assert(m.track == 7L && m.lenMs == 31000L)
    assert(m.tagBytes == tag.length.toLong,
      "declared syncsafe size must equal the built tag exactly")

    // truncations inside header and frames: clean None, never an overrun
    for (cut <- Seq(2, 9, 12, 30, tag.length - 20))
      assert(Id3.meta(withAudio.take(cut)).isEmpty, s"cut=$cut")
    // crafted frame size that runs past the declared tag end
    val bad = withAudio.clone()
    bad(14) = 0x7f // TIT2's size high byte -> huge
    assert(Id3.meta(bad).isEmpty)
    // a non-[A-Z0-9] frame id means desync: decline, don't guess
    val badId = withAudio.clone(); badId(10) = '~'
    assert(Id3.meta(badId).isEmpty)
    // v2.4 uses syncsafe FRAME sizes — parsing it as v2.3 would mis-frame,
    // so the walker declines the version outright
    val v24 = withAudio.clone(); v24(3) = 4
    assert(Id3.meta(v24).isEmpty)
    // syncsafe header bytes must keep the high bit clear
    val badSync = withAudio.clone(); badSync(6) = 0x80.toByte
    assert(Id3.meta(badSync).isEmpty)
    // not a tag at all
    assert(Id3.meta(Array[Byte](1, 2, 3)).isEmpty)
  }
}
