package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2F).
  *
  * Media payloads ride as opaque `binary` columns next to typed metadata —
  * the schema pattern that scales: parquet stores blobs page-compressed,
  * predicates prune on the metadata columns, and only matching rows'
  * blobs are ever decoded.
  *
  * Decode is per-partition batched (`mapPartitions` over a typed Dataset —
  * the Scala analogue of mapInPandas): the expensive decoder/codec init
  * happens once per partition, then streams through the iterator without
  * materializing the partition in memory.
  *
  * The actual media decode is STUBBED (container has no image/audio libs)
  * with a deterministic frame-splitter + md5 "feature extractor"; the Spark
  * plumbing — schema, batching, partitioning — is real and tested.
  */
object Multimodal {

  final case class Blob(doc_id: Long, media_type: String, n_bytes: Long, payload: Array[Byte])
  final case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Int, frame_md5: String)
  final case class Feature(doc_id: Long, features: Array[Double])

  /** Wrap documents as (metadata, binary payload) rows — the ingest shape. */
  def asBlobs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("text/plain;fake-video").as("media_type"),
      length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
      encode(col("text"), "UTF-8").as("payload"))

  final case class Sharded(source: String, doc_id: Long, n_bytes: Long,
      shard_idx: Long, offset_bytes: Long)

  /** Webdataset-style shard assignment: blobs are packed FIRST-FIT into
    * byte-budgeted shard files, in (group, doc_id) order, and — unlike
    * token packing (t_pack) — a blob is never split: one that would cross
    * the budget starts the next shard, and an oversized blob gets a shard
    * to itself. The fold is inherently sequential per group (each placement
    * depends on the previous one), so it runs through
    * `flatMapSortedGroups`: groups execute in parallel across the cluster,
    * the runtime feeds each group's rows already sorted (no per-group
    * buffering of unsorted input), and only the running (shard, offset)
    * pair is held per group. At 100 TB the group key IS the parallelism
    * unit — shard by (source, date, ...) buckets, never one global key. */
  def shardAssign(blobs: DataFrame, groupCol: String, budgetBytes: Long): Dataset[Sharded] = {
    import blobs.sparkSession.implicits._
    blobs.select(col(groupCol).as("g"), col("doc_id"), col("n_bytes"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("doc_id")) { (g, it) =>
        var shard = 0L; var end = 0L
        it.map { case (_, id, n) =>
          val (s, off) = if (end > 0 && end + n > budgetBytes) (shard + 1, 0L) else (shard, end)
          shard = s; end = off + n
          Sharded(g, id, n, s, off)
        }
      }
  }

  /** REAL feature extraction (no codec needed): L1-normalized 16-bin byte
    * histogram per payload — a genuine content feature over any binary
    * column, batched per partition like the decode path. Counts divide by
    * the payload length in one double division, so the features are
    * bit-deterministic and (for ASCII payloads) exactly reproducible from
    * the character codes SQL-side. Bin = byte >> 4. */
  def byteHistogram(blobs: Dataset[Blob]): Dataset[Feature] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.map { b =>
        val counts = new Array[Long](16)
        var i = 0
        while (i < b.payload.length) { counts((b.payload(i) & 0xff) >> 4) += 1; i += 1 }
        val n = math.max(b.payload.length, 1).toDouble
        Feature(b.doc_id, counts.map(_ / n))
      }
    }
  }

  final case class FrameHist(doc_id: Long, frame_idx: Int, counts: Array[Long])

  /** Per-frame 16-bin byte histograms over CONSECUTIVE fixed-size frames
    * (every frame, stride 1 — unlike sampleFrames' sampling): the feature
    * stream shot-boundary detection consumes. Same batched per-partition
    * shape as byteHistogram; a pixel-domain color histogram plugs into the
    * loop body when a real codec decodes the frames. Integer counts, so
    * downstream frame-to-frame distances are exact in any engine. */
  def frameHistograms(blobs: Dataset[Blob], frameSize: Int = 64): Dataset[FrameHist] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.flatMap { b =>
        val n = b.payload.length
        val frames = (n + frameSize - 1) / frameSize
        (0 until frames).iterator.map { fi =>
          val counts = new Array[Long](16)
          var i = fi * frameSize
          val end = math.min(i + frameSize, n)
          while (i < end) { counts((b.payload(i) & 0xff) >> 4) += 1; i += 1 }
          FrameHist(b.doc_id, fi, counts)
        }
      }
    }
  }

  final case class Resized(doc_id: Long, orig_bytes: Long, resized_bytes: Long, resized_md5: String)

  /** REAL byte-domain "resize": strided downsampling of the payload (keep
    * every `stride`-th byte) — the batched-transform shape a pixel-domain
    * resize plugs into (swap the loop body for the interpolation kernel;
    * schema, batching and partitioning stay identical). */
  def resize(blobs: Dataset[Blob], stride: Int = 4): Dataset[Resized] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      val digest = MessageDigest.getInstance("MD5")
      it.map { b =>
        val out = new Array[Byte]((b.payload.length + stride - 1) / stride)
        var i = 0
        while (i < out.length) { out(i) = b.payload(i * stride); i += 1 }
        digest.reset()
        val hex = digest.digest(out).map("%02x".format(_)).mkString
        Resized(b.doc_id, b.payload.length.toLong, out.length.toLong, hex)
      }
    }
  }

  /** Injectable media codec: the stub/real swap is a constructor argument,
    * not a code edit. Instances ship serialized to executors; `open()` runs
    * once per partition on the executor (load the native codec, allocate
    * scratch buffers) before any blob decodes — the contract MultimodalSpec
    * pins with a second implementation. */
  trait FrameDecoder extends Serializable {
    /** Once-per-partition executor-side init. Default: nothing. */
    def open(): Unit = ()
    def decode(blob: Blob): Iterator[Frame]
  }

  /** Deterministic STUB codec (container has no media libs): split the
    * payload into fixed-size "frames", keep every `stride`-th, md5 as the
    * stand-in feature. Replace with a real decoder class, same trait. */
  final class StubFrameDecoder(frameSize: Int = 64, stride: Int = 4) extends FrameDecoder {
    @transient private var digest: MessageDigest = _
    override def open(): Unit = { digest = MessageDigest.getInstance("MD5") }
    override def decode(b: Blob): Iterator[Frame] = {
      val n = b.payload.length
      (0 until (n + frameSize - 1) / frameSize).iterator
        .filter(_ % stride == 0)
        .map { fi =>
          val from = fi * frameSize
          val until = math.min(from + frameSize, n)
          digest.reset()
          val hex = digest.digest(java.util.Arrays.copyOfRange(b.payload, from, until))
            .map("%02x".format(_)).mkString
          Frame(b.doc_id, fi, until - from, hex)
        }
    }
  }

  /** REAL image codec — javax.imageio, which ships with the JDK, so no
    * external media libs are needed. Decodes still images (png/gif/jpeg/
    * bmp) and multi-frame containers (animated GIF): one Frame per
    * `stride`-th image, frame_bytes = decoded pixel count, frame_md5 over
    * the ARGB raster in row-major order (a content hash of the DECODED
    * pixels, so two encodings of the same image collide). Undecodable
    * payloads yield zero frames instead of failing the task — at 100 TB a
    * corrupt blob must never kill an ingest job; count them from the
    * per-doc frame totals. Frames are materialized eagerly per blob
    * (bounded: frames-per-container) so the reader closes deterministically
    * while the partition iterator stays streaming blob-to-blob. */
  final class ImageIoFrameDecoder(stride: Int = 1) extends FrameDecoder {
    @transient private var digest: MessageDigest = _
    override def open(): Unit = { digest = MessageDigest.getInstance("MD5") }
    override def decode(b: Blob): Iterator[Frame] = try {
      // the WHOLE body is guarded, including createImageInputStream and
      // getImageReaders (either can throw on hostile bytes, and the
      // stream can come back null) — the zero-frames-on-corrupt contract
      // must hold no matter where the codec fails
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(b.payload))
      if (in == null) return Iterator.empty
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) return Iterator.empty
        val reader = readers.next()
        try {
          reader.setInput(in)
          val n = try math.max(reader.getNumImages(true), 1)
          catch { case _: Exception => 1 }
          (0 until n).filter(_ % stride == 0).flatMap { fi =>
            try {
              val img = reader.read(fi)
              val (w, h) = (img.getWidth, img.getHeight)
              val argb = img.getRGB(0, 0, w, h, null, 0, w)
              val bytes = java.nio.ByteBuffer.allocate(argb.length * 4)
              argb.foreach(bytes.putInt)
              digest.reset()
              val hex = digest.digest(bytes.array()).map("%02x".format(_)).mkString
              Some(Frame(b.doc_id, fi, w * h, hex))
            } catch { case _: Exception => None } // corrupt frame: skip it
          }.iterator
        } finally reader.dispose()
      } finally in.close()
    } catch { case _: Exception => Iterator.empty } // corrupt blob: zero frames
  }

  /** REAL video codec for MJPEG-style streams — the simplest real
    * frame-SEQUENCE container: the payload is back-to-back JPEG stills
    * (how MJPEG AVIs, many IP cameras and multipart/x-mixed-replace
    * streams carry video). The decoder walks the JPEG marker structure
    * once — length-delimited segments (APPn/COM/DQT/SOF/SOS…) are SKIPPED
    * by their 2-byte length fields, so an EXIF APP1 segment embedding a
    * complete thumbnail JPEG (its own SOI/EOI) can never split the
    * enclosing frame (a raw FF D8/FF D9 byte scan systematically lost
    * every EXIF-bearing frame that way); in entropy-coded data only
    * stuffed FF 00, fill FFs, restart markers and EOI are interpreted,
    * exactly the JPEG rule. Carved per-frame ranges decode every
    * `stride`-th frame through the same javax.imageio path as still
    * images — frame_idx is the TEMPORAL index, frame_md5 the content
    * hash of the decoded ARGB raster, so re-encodings of the same pixels
    * collide exactly like the still path. Corrupt frames are skipped,
    * corrupt blobs yield zero frames (same ingest contract as
    * ImageIoFrameDecoder). */
  final class MjpegFrameDecoder(stride: Int = 1) extends FrameDecoder {
    @transient private var digest: MessageDigest = _
    override def open(): Unit = { digest = MessageDigest.getInstance("MD5") }
    override def decode(b: Blob): Iterator[Frame] = try {
      val p = b.payload
      val bounds = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var i = 0; var start = -1
      while (i + 1 < p.length) {
        if (start < 0) {
          // between frames: hunt for the next SOI
          if ((p(i) & 0xff) == 0xff && (p(i + 1) & 0xff) == 0xd8) { start = i; i += 2 }
          else i += 1
        } else if ((p(i) & 0xff) != 0xff) i += 1 // entropy-coded data
        else (p(i + 1) & 0xff) match {
          case 0x00 => i += 2            // stuffed FF inside entropy data
          case 0xff => i += 1            // fill byte; next FF may start a marker
          case 0xd9 => bounds += ((start, i + 2)); start = -1; i += 2 // EOI
          case m if (m >= 0xd0 && m <= 0xd7) || m == 0x01 => i += 2   // RST/TEM: no payload
          case _ =>
            // length-delimited segment (APPn, COM, DQT, DHT, SOF, SOS, …):
            // skip the whole payload — nested SOI/EOI inside (EXIF
            // thumbnails!) must never terminate the enclosing frame
            if (i + 3 >= p.length) { start = -1; i = p.length } // truncated header
            else {
              val len = ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
              if (len < 2) { start = -1; i += 2 } // malformed: abandon this frame
              else i += 2 + len
            }
        }
      }
      // frames materialize EAGERLY per blob (same contract as the still
      // decoder): a lazy iterator over b.payload would read the buffer
      // after the partition iterator advanced past the blob
      bounds.toVector.zipWithIndex
        .filter { case (_, fi) => fi % stride == 0 }
        .flatMap { case ((from, until), fi) =>
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
              java.util.Arrays.copyOfRange(p, from, until)))
            if (img == null) None
            else {
              val (w, h) = (img.getWidth, img.getHeight)
              val argb = img.getRGB(0, 0, w, h, null, 0, w)
              val bytes = java.nio.ByteBuffer.allocate(argb.length * 4)
              argb.foreach(bytes.putInt)
              digest.reset()
              val hex = digest.digest(bytes.array()).map("%02x".format(_)).mkString
              Some(Frame(b.doc_id, fi, w * h, hex))
            }
          } catch { case _: Exception => None } // corrupt frame: skip it
        }.iterator
    } catch { case _: Exception => Iterator.empty } // corrupt blob: zero frames
  }

  /** 64-bit average-hash (aHash) perceptual fingerprint of a decoded
    * image: bilinear-downscale to 8×8, integer BT.601 luma, one bit per
    * cell (luma > integer mean). Two ENCODINGS of the same picture (png
    * vs jpeg, different quality) land within a few bits; unrelated
    * pictures differ in ~32 — exactly the signature shape
    * SimHashDedup.pairsFromSignatures retrieves at Hamming ≤ 3, which is
    * how image near-dup dedup rides the existing text machinery. */
  def averageHash(img: java.awt.image.BufferedImage): Long = {
    val scaled = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = scaled.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, 8, 8, null)
    } finally g.dispose()
    val lum = new Array[Int](64)
    var i = 0
    while (i < 64) {
      val rgb = scaled.getRGB(i % 8, i / 8)
      lum(i) = ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
      i += 1
    }
    val mean = lum.sum / 64
    lum.zipWithIndex.foldLeft(0L) { case (acc, (v, j)) =>
      if (v > mean) acc | (1L << j) else acc }
  }

  final case class PerceptualHash(doc_id: Long, simhash: Long)

  /** Per-partition batched perceptual hashing of image blobs — column
    * named `simhash` so the output feeds SimHashDedup.pairsFromSignatures
    * directly (image near-dup candidate retrieval without an O(n²) pass).
    * Undecodable payloads yield no row (count them from the input diff). */
  def perceptualHashes(blobs: Dataset[Blob]): Dataset[PerceptualHash] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.flatMap { b =>
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b.payload))
          if (img == null) None else Some(PerceptualHash(b.doc_id, averageHash(img)))
        } catch { case _: Exception => None }
      }
    }
  }

  /** Decode every blob through `decoder`, per-partition batched: open()
    * once per partition, then stream — no partition materialization. */
  def decodeFrames(blobs: Dataset[Blob], decoder: FrameDecoder): Dataset[Frame] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      decoder.open()
      it.flatMap(decoder.decode)
    }
  }

  /** Codec selection by name — the config seam sampleFrames consults. */
  def decoderFor(name: String, frameSize: Int = 64, stride: Int = 4): FrameDecoder =
    name match {
      case "stub"    => new StubFrameDecoder(frameSize, stride)
      case "imageio" => new ImageIoFrameDecoder(stride)
      case "mjpeg"   => new MjpegFrameDecoder(stride)
      case "wav"     => new Audio.WavFrameDecoder(frameSize, stride)
      case other => throw new IllegalArgumentException(
        s"unknown decoder '$other' (stub | imageio | mjpeg | wav)")
    }

  /** Conf key selecting the frame codec ("stub" default, "imageio" for
    * the real JDK image path). The GATE stays on the deterministic stub
    * (the oracle replays it in SQL); a deployment flips the conf. */
  val DecoderConf = "spark.graft.multimodal.decoder"

  /** Frame sampling through the configured codec (m_frame_sample gate
    * path; stub unless spark.graft.multimodal.decoder says otherwise). */
  def sampleFrames(blobs: Dataset[Blob], frameSize: Int = 64, stride: Int = 4): Dataset[Frame] = {
    val name = blobs.sparkSession.conf.get(DecoderConf, "stub")
    decodeFrames(blobs, decoderFor(name, frameSize, stride))
  }
}
