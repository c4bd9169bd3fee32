package graft.ext

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators implemented as partition-wise batch
  * transforms (`mapPartitions` with product encoders — the Scala
  * analogue of arrow-batched pandas UDFs: one JVM call per partition,
  * rows streamed through an iterator, never collected).
  *
  * Codec status: IMAGES, AUDIO, AND ANIMATED-GIF VIDEO ARE REAL —
  * PNG (and any other `javax.imageio` format) payloads are decoded,
  * resized, and feature-extracted with the JDK's ImageIO; WAV/PCM
  * payloads are decoded and feature-extracted with the JDK's
  * `javax.sound.sampled`; and `kind=video` payloads carrying an
  * animated GIF are decoded frame-by-frame, frame-sampled, resized,
  * and feature-extracted through ImageIO's multi-image GIF
  * reader/writer — no external deps anywhere. MP4-CLASS CONTAINER
  * VIDEO IS DEMUXED FOR REAL ([[Codec.readMp4Video]]: ISO BMFF box
  * walk + stsz/stsc/stco sample-table expansion, pure byte parsing) —
  * decode metadata (dims, frame count, codec fourcc) and
  * frame-sampling (encoded access units, exactly what a downstream
  * GPU decoder consumes) work without any codec; only operations
  * needing PIXELS from those samples (resize) sit behind the
  * native-codec seam and fail loudly. [[FakeCodec.decode]]'s
  * deterministic 24-byte "GRFT" header remains the stand-in for
  * payloads no real path claims. The Spark-side contract — binary
  * column in, typed struct out, per-partition batching, partition
  * balance by asset id — is identical for all paths.
  *
  * Scale notes: payload bytes never transit a shuffle in any operator
  * here — decode/feature/resize are narrow maps; only the extracted
  * features (small, fixed-size) should ever be joined or aggregated.
  */
object Multimodal {

  /** Typed metadata carried alongside every binary payload. */
  final case class MediaMeta(kind: String, width: Int, height: Int,
                             sampleRate: Int, nFrames: Int)
  final case class Asset(asset_id: Long, kind: String, payload: Array[Byte])
  final case class Decoded(asset_id: Long, kind: String, width: Int, height: Int,
                           sampleRate: Int, nFrames: Int, payloadBytes: Int)
  final case class Features(asset_id: Long, features: Array[Float])
  final case class Frame(asset_id: Long, frame_idx: Int, frame: Array[Byte])

  /** The stand-in codec for this environment. A real deployment
    * replaces the bodies of decode/encode; signatures stay.
    */
  object FakeCodec {
    val Magic: Int = 0x47524654 // "GRFT"
    val HeaderLen: Int = 24

    /** Deterministic synthetic payload: header(magic, kind, w, h, rate,
      * frames) + body bytes derived from the asset id.
      */
    def encode(meta: MediaMeta, assetId: Long, bodyLen: Int): Array[Byte] = {
      val buf = ByteBuffer.allocate(HeaderLen + bodyLen).order(ByteOrder.BIG_ENDIAN)
      buf.putInt(Magic)
      buf.putInt(meta.kind.hashCode)
      buf.putInt(meta.width); buf.putInt(meta.height)
      buf.putInt(meta.sampleRate); buf.putInt(meta.nFrames)
      var i = 0
      while (i < bodyLen) { buf.put(((assetId * 31 + i * 7) % 251).toByte); i += 1 }
      buf.array()
    }

    /** Header parse — the seam where a real decoder goes (audio/video). */
    def decode(kind: String, payload: Array[Byte]): MediaMeta = {
      require(payload.length >= HeaderLen, s"truncated payload: ${payload.length} bytes")
      val buf = ByteBuffer.wrap(payload).order(ByteOrder.BIG_ENDIAN)
      require(buf.getInt() == Magic, "bad magic: not a GRFT payload")
      buf.getInt() // kind hash, informational
      MediaMeta(kind, buf.getInt(), buf.getInt(), buf.getInt(), buf.getInt())
    }
  }

  /** The real/fake dispatch: real ImageIO for image formats the JDK
    * recognizes (PNG/JPEG/GIF/BMP signatures sniffed), real javax.sound
    * for WAV, GRFT header parse otherwise. Executor-side only; both JDK
    * codecs work headless.
    */
  object Codec {
    // ImageIO defaults to DISK-backed stream caches: left alone, every
    // decode/encode of an in-memory byte-array payload creates and
    // deletes a temp FILE (FileCacheImageInputStream) — measured as
    // executor threads spending most of their time in UnixFileSystem
    // .delete during the 10× multimodal bench. Payloads here are always
    // small in-memory arrays, so every ImageIO call below wraps its
    // bytes in an explicit MemoryCache image stream PER STREAM rather
    // than flipping the process-global ImageIO.setUseCache default —
    // co-resident application code in the same JVM (possibly reading
    // images too large to buffer on heap) keeps its own trade-off.
    private def memIn(bytes: Array[Byte]): javax.imageio.stream.ImageInputStream =
      new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))

    /** PNG bytes via an explicitly memory-cached output stream. */
    def writePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      // close() flushes all pending cached data to `bos` before release
      try require(javax.imageio.ImageIO.write(img, "png", ios),
        "no ImageIO PNG writer available")
      finally ios.close()
      bos.toByteArray
    }

    private val PngSig = Array(0x89, 0x50, 0x4E, 0x47).map(_.toByte)
    private val JpegSig = Array(0xFF, 0xD8, 0xFF).map(_.toByte)
    private val GifSig = "GIF8".getBytes("US-ASCII")
    private val BmpSig = "BM".getBytes("US-ASCII")

    private def startsWith(payload: Array[Byte], sig: Array[Byte]): Boolean =
      payload.length >= sig.length && java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(payload, 0, sig.length), sig)

    def isPng(payload: Array[Byte]): Boolean = startsWith(payload, PngSig)

    /** Any image signature ImageIO ships a reader for (PNG/JPEG/GIF/BMP). */
    def isImage(payload: Array[Byte]): Boolean =
      isPng(payload) || startsWith(payload, JpegSig) ||
        startsWith(payload, GifSig) || startsWith(payload, BmpSig)

    def readImage(payload: Array[Byte]): java.awt.image.BufferedImage = {
      // the ImageInputStream overload closes the stream after reading
      val img = javax.imageio.ImageIO.read(memIn(payload))
      require(img != null, "undecodable image payload")
      img
    }

    def isGif(payload: Array[Byte]): Boolean = startsWith(payload, GifSig)

    /** All stored frames of a (possibly animated) GIF, in order. Frames
      * are returned as stored — GIF inter-frame compositing (partial
      * frames + disposal methods) is not resolved; encoders that emit
      * full frames (including [[writeGif]]) round-trip exactly.
      */
    def readGifFrames(payload: Array[Byte]): IndexedSeq[java.awt.image.BufferedImage] = {
      val iis = memIn(payload)
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, "no ImageIO reader for GIF payload")
        val reader = readers.next()
        try {
          reader.setInput(iis, false)
          val n = reader.getNumImages(true)
          require(n > 0, "GIF payload with no frames")
          (0 until n).map(reader.read(_))
        } finally reader.dispose()
      } finally iis.close()
    }

    /** Multi-frame (animated) GIF bytes from a frame sequence — the
      * JDK's GIF writer quantizes each frame's palette itself.
      */
    def writeGif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
      require(frames.nonEmpty, "cannot encode a zero-frame GIF")
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        frames.foreach(f =>
          writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }

    private val WavRiff = "RIFF".getBytes("US-ASCII")
    private val WavWave = "WAVE".getBytes("US-ASCII")

    def isWav(payload: Array[Byte]): Boolean =
      payload.length >= 12 &&
        java.util.Arrays.equals(java.util.Arrays.copyOfRange(payload, 0, 4), WavRiff) &&
        java.util.Arrays.equals(java.util.Arrays.copyOfRange(payload, 8, 12), WavWave)

    /** Decoded WAV: (format, raw PCM bytes past the header). */
    def readWav(payload: Array[Byte]): (javax.sound.sampled.AudioFormat, Array[Byte]) = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try (ais.getFormat, ais.readAllBytes()) finally ais.close()
    }

    // ---- ISO BMFF (MP4/MOV) container demux: pure byte parsing. ----
    // The DEMUX side of container video is plain structure walking the
    // JDK handles fine (boxes, sample tables); only pixel DECODE of the
    // H.264/H.265 samples needs a native codec. So sample extraction,
    // frame counts, and dimensions are REAL here; anything needing
    // pixels (resize) stays behind the codec seam.

    private val FtypSig = "ftyp".getBytes("US-ASCII")

    def isMp4(payload: Array[Byte]): Boolean =
      payload.length >= 12 && java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(payload, 4, 8), FtypSig)

    /** One video track's demuxed shape: codec fourcc, pixel dims from
      * tkhd, and every sample's (offset, size) in the payload — the
      * encoded access units a downstream GPU decoder consumes.
      */
    final case class Mp4Video(codec: String, width: Int, height: Int,
                              sampleSizes: IndexedSeq[Int],
                              sampleOffsets: IndexedSeq[Long])

    /** Parse the first `vide`-handler track. Strict on structure it
      * uses (sample tables must be present and in-bounds), lenient on
      * everything it doesn't (unknown boxes are skipped by size).
      */
    def readMp4Video(payload: Array[Byte]): Mp4Video = {
      val bb = java.nio.ByteBuffer.wrap(payload)
      def u32(at: Long): Long = bb.getInt(at.toInt) & 0xFFFFFFFFL
      def fourcc(at: Long): String =
        new String(payload, at.toInt, 4, "US-ASCII")
      /** (boxType, contentStart, contentEnd) for each box in [start, end). */
      def boxes(start: Long, end: Long): Seq[(String, Long, Long)] = {
        val out = Seq.newBuilder[(String, Long, Long)]
        var p = start
        while (p + 8 <= end) {
          val size0 = u32(p)
          val typ = fourcc(p + 4)
          val (contentStart, boxEnd) =
            if (size0 == 1) (p + 16, p + bb.getLong(p.toInt + 8)) // 64-bit largesize
            else if (size0 == 0) (p + 8, end)                      // box runs to end
            else (p + 8, p + size0)
          require(boxEnd > p && boxEnd <= end, s"mp4 box '$typ' overruns its container")
          out += ((typ, contentStart, boxEnd))
          p = boxEnd
        }
        out.result()
      }
      def find(range: Seq[(String, Long, Long)], typ: String): Option[(Long, Long)] =
        range.collectFirst { case (`typ`, s, e) => (s, e) }
      val top = boxes(0L, payload.length.toLong)
      val (moovS, moovE) = find(top, "moov")
        .getOrElse(throw new IllegalArgumentException("mp4 payload has no moov box"))
      val videoTrack = boxes(moovS, moovE).collect { case ("trak", ts, te) =>
        val trak = boxes(ts, te)
        val mdia = find(trak, "mdia").map { case (s, e) => boxes(s, e) }.getOrElse(Nil)
        val handler = find(mdia, "hdlr").map { case (s, _) => fourcc(s + 8) }
        (trak, mdia, handler)
      }.collectFirst { case t @ (_, _, Some("vide")) => t }
        .getOrElse(throw new IllegalArgumentException("mp4 payload has no video (vide) track"))
      val (trak, mdia, _) = videoTrack
      // tkhd: width/height as 16.16 fixed point; field offsets shift
      // with the box version (v1 widens the time fields to 64-bit)
      val (wh: (Int, Int)) = find(trak, "tkhd").map { case (s, _) =>
        val at = if (payload(s.toInt) == 1) s + 88 else s + 76
        ((u32(at) >> 16).toInt, (u32(at + 4) >> 16).toInt)
      }.getOrElse((0, 0))
      val stbl = find(mdia, "minf").map { case (s, e) => boxes(s, e) }
        .flatMap(minf => find(minf, "stbl")).map { case (s, e) => boxes(s, e) }
        .getOrElse(throw new IllegalArgumentException("mp4 video track has no stbl"))
      def req(typ: String): (Long, Long) = find(stbl, typ).getOrElse(
        throw new IllegalArgumentException(s"mp4 sample table missing '$typ'"))
      val codec = { val (s, _) = req("stsd"); fourcc(s + 12) } // first entry's format
      // stsz: uniform size or per-sample table
      val sizes: IndexedSeq[Int] = { val (s, _) = req("stsz")
        val uniform = u32(s + 4); val n = u32(s + 8).toInt
        if (uniform != 0) IndexedSeq.fill(n)(uniform.toInt)
        else (0 until n).map(i => u32(s + 12 + 4L * i).toInt)
      }
      // stco/co64: chunk offsets (absolute file offsets)
      val chunkOffsets: IndexedSeq[Long] =
        find(stbl, "stco").map { case (s, _) =>
          (0 until u32(s + 4).toInt).map(i => u32(s + 8 + 4L * i))
        }.orElse(find(stbl, "co64").map { case (s, _) =>
          (0 until u32(s + 4).toInt).map(i => bb.getLong(s.toInt + 8 + 8 * i))
        }).getOrElse(throw new IllegalArgumentException("mp4 sample table missing 'stco'/'co64'"))
      // stsc: (first_chunk, samples_per_chunk) runs -> per-chunk counts
      val stscRuns: IndexedSeq[(Long, Long)] = { val (s, _) = req("stsc")
        (0 until u32(s + 4).toInt).map(i =>
          (u32(s + 8 + 12L * i), u32(s + 12 + 12L * i)))
      }
      val offsets = IndexedSeq.newBuilder[Long]
      var sample = 0
      for ((chunkOff, ci) <- chunkOffsets.zipWithIndex if sample < sizes.length) {
        val spc = stscRuns.takeWhile(_._1 <= ci + 1).lastOption.map(_._2.toInt)
          .getOrElse(throw new IllegalArgumentException("mp4 stsc covers no chunks"))
        var within = 0L
        var i = 0
        while (i < spc && sample < sizes.length) {
          require(chunkOff + within + sizes(sample) <= payload.length,
            s"mp4 sample $sample overruns the payload")
          offsets += chunkOff + within
          within += sizes(sample)
          sample += 1
          i += 1
        }
      }
      require(sample == sizes.length,
        s"mp4 chunk map covers $sample of ${sizes.length} samples")
      Mp4Video(codec, wh._1, wh._2, sizes, offsets.result())
    }

    def decode(kind: String, payload: Array[Byte]): MediaMeta =
      if (kind == "image" && isImage(payload)) {
        val img = readImage(payload)
        MediaMeta(kind, img.getWidth, img.getHeight, 0, 1)
      } else if (kind == "audio" && isWav(payload)) {
        val (fmt, pcm) = readWav(payload)
        MediaMeta(kind, 0, 0, fmt.getSampleRate.toInt,
          pcm.length / math.max(1, fmt.getFrameSize))
      } else if (kind == "video" && isGif(payload)) {
        val frames = readGifFrames(payload)
        MediaMeta(kind, frames.head.getWidth, frames.head.getHeight, 0, frames.length)
      } else if (kind == "video" && isMp4(payload)) {
        val v = readMp4Video(payload)
        MediaMeta(kind, v.width, v.height, 0, v.sampleSizes.length)
      } else FakeCodec.decode(kind, payload)
  }

  /** Deterministic synthetic asset table (one asset per document id) —
    * the fixture generator for tests/benches. Distributed: built from a
    * range, payloads created executor-side.
    */
  def syntheticAssets(spark: SparkSession, n: Int, bodyLen: Int = 4096): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val meta = kind match {
        case "image" => MediaMeta(kind, 64 + (id % 8).toInt * 16, 64, 0, 1)
        case "audio" => MediaMeta(kind, 0, 0, 16000, 1)
        case _       => MediaMeta(kind, 32, 32, 0, 4 + (id % 4).toInt)
      }
      Asset(id, kind, FakeCodec.encode(meta, id, bodyLen))
    }
  }

  /** Decode: binary + kind → typed metadata row. Partition-wise batch
    * transform; `repartition(asset_id)` upstream if payload sizes skew.
    */
  def decode(assets: Dataset[Asset]): Dataset[Decoded] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val m = Codec.decode(a.kind, a.payload)
      Decoded(a.asset_id, a.kind, m.width, m.height, m.sampleRate, m.nFrames,
        a.payload.length)
    })
  }

  /** Feature extraction: payload → fixed-size float vector,
    * L1-normalized (`array<float>` of fixed dim, joinable with
    * [[Similarity]] ops). Real images: a `dim`-bin 8-bit luminance
    * histogram over decoded pixels. Real WAV audio: a `dim`-bin
    * amplitude histogram over the decoded 16-bit PCM samples. GRFT
    * payloads: a byte histogram of the synthetic body — the
    * deterministic stand-in for an embedding model's output.
    */
  def extractFeatures(assets: Dataset[Asset], dim: Int = 64): Dataset[Features] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val counts = new Array[Float](dim)
      var total = 0f
      if (a.kind == "audio" && Codec.isWav(a.payload)) {
        import javax.sound.sampled.AudioFormat.Encoding
        val (fmt, pcm) = Codec.readWav(a.payload)
        // dispatch on the ACTUAL sample format — assuming 16-bit here
        // would fuse byte pairs of an 8-bit WAV into garbage samples
        if (fmt.getEncoding == Encoding.PCM_SIGNED && fmt.getSampleSizeInBits == 16) {
          val n = pcm.length / 2
          val le = !fmt.isBigEndian
          var i = 0
          while (i < n) {
            val lo = pcm(2 * i) & 0xFF
            val hi = pcm(2 * i + 1) & 0xFF
            val s = (if (le) (hi << 8) | lo else (lo << 8) | hi).toShort.toInt
            counts(((s + 32768) * dim) >>> 16) += 1f // 16-bit range -> dim bins
            i += 1
          }
          total = math.max(1f, n.toFloat)
        } else if (fmt.getEncoding == Encoding.PCM_UNSIGNED && fmt.getSampleSizeInBits == 8) {
          var i = 0
          while (i < pcm.length) {
            counts(((pcm(i) & 0xFF) * dim) >>> 8) += 1f // 8-bit range -> dim bins
            i += 1
          }
          total = math.max(1f, pcm.length.toFloat)
        } else {
          // other encodings (float, u-law, 24-bit...): raw-byte histogram,
          // still deterministic and L1-normalized, never garbage samples
          var i = 0
          while (i < pcm.length) {
            counts((pcm(i) & 0xFF) % dim) += 1f
            i += 1
          }
          total = math.max(1f, pcm.length.toFloat)
        }
      } else if (a.kind == "image" && Codec.isImage(a.payload)) {
        val img = Codec.readImage(a.payload)
        lumHistogram(img, counts, dim)
        total = math.max(1f, (img.getWidth * img.getHeight).toFloat)
      } else if (a.kind == "video" && Codec.isGif(a.payload)) {
        // luminance histogram pooled over every frame — the video
        // analogue of the image feature, deterministic per payload
        val frames = Codec.readGifFrames(a.payload)
        var px = 0L
        frames.foreach { f =>
          lumHistogram(f, counts, dim)
          px += f.getWidth.toLong * f.getHeight
        }
        total = math.max(1f, px.toFloat)
      } else if (a.kind == "video" && Codec.isMp4(a.payload)) {
        // encoded-domain byte histogram over the demuxed video samples
        // (pixel features need the codec seam); deterministic, and
        // sample-bounded rather than payload-bounded — container
        // metadata bytes don't pollute the signature
        val v = Codec.readMp4Video(a.payload)
        var n = 0L
        var s = 0
        while (s < v.sampleSizes.length) {
          val start = v.sampleOffsets(s).toInt
          var i = 0
          while (i < v.sampleSizes(s)) {
            counts(java.lang.Byte.toUnsignedInt(a.payload(start + i)) % dim) += 1f
            i += 1
          }
          n += v.sampleSizes(s)
          s += 1
        }
        total = math.max(1f, n.toFloat)
      } else {
        var i = FakeCodec.HeaderLen
        while (i < a.payload.length) {
          counts(java.lang.Byte.toUnsignedInt(a.payload(i)) % dim) += 1f
          i += 1
        }
        total = math.max(1f, (a.payload.length - FakeCodec.HeaderLen).toFloat)
      }
      Features(a.asset_id, counts.map(_ / total))
    })
  }

  /** Accumulate an 8-bit-luminance histogram of an image into `counts`. */
  private def lumHistogram(img: java.awt.image.BufferedImage,
                           counts: Array[Float], dim: Int): Unit = {
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
          (rgb & 0xFF) * 114) / 1000
        counts(lum * dim / 256) += 1f
        x += 1
      }
      y += 1
    }
  }

  /** Bilinear rescale of one frame to (width, height). */
  private def rescale(img: java.awt.image.BufferedImage, width: Int, height: Int,
                      imageType: Int): java.awt.image.BufferedImage = {
    val scaled = new java.awt.image.BufferedImage(width, height, imageType)
    val g = scaled.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, width, height, null)
    g.dispose()
    scaled
  }

  /** Resize. Real images: bilinear pixel rescale via Graphics2D,
    * re-encoded as PNG. Real WAV audio: pass-through (pixel dimensions
    * don't apply to audio; resampling is a different operator). GRFT
    * payloads: stub transform — re-encode header + body scaled by area
    * ratio. Narrow map, payload stays partition-local.
    */
  def resize(assets: Dataset[Asset], width: Int, height: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      if (a.kind == "audio" && Codec.isWav(a.payload)) {
        a
      } else if (a.kind == "image" && Codec.isImage(a.payload)) {
        val scaled = rescale(Codec.readImage(a.payload), width, height,
          java.awt.image.BufferedImage.TYPE_INT_ARGB)
        a.copy(payload = Codec.writePng(scaled))
      } else if (a.kind == "video" && Codec.isGif(a.payload)) {
        // per-frame bilinear rescale, re-encoded as an animated GIF
        // (TYPE_INT_RGB: the GIF writer quantizes opaque frames itself)
        val frames = Codec.readGifFrames(a.payload).map(
          rescale(_, width, height, java.awt.image.BufferedImage.TYPE_INT_RGB))
        a.copy(payload = Codec.writeGif(frames))
      } else if (a.kind == "video" && Codec.isMp4(a.payload)) {
        // resize needs PIXELS: demux can hand over the encoded samples
        // (see sampleFrames) but rescaling them means decode+re-encode —
        // the one genuinely codec-bound operation. Fail loudly rather
        // than pass through silently at the wrong resolution.
        throw new UnsupportedOperationException(
          "MP4 resize requires a pixel codec (H.264/H.265 decode + encode); " +
            "demux/sampleFrames/decode/extractFeatures are available without one")
      } else {
        val m = FakeCodec.decode(a.kind, a.payload)
        val body = a.payload.length - FakeCodec.HeaderLen
        // scale body size with area ratio, deterministically
        val newBody = math.max(1,
          (body.toLong * (width.toLong * height) /
            math.max(1, m.width.toLong * m.height)).toInt)
        a.copy(payload = FakeCodec.encode(m.copy(width = width, height = height),
          a.asset_id, newBody))
      }
    })
  }

  /** Frame sampling: one output row per sampled frame (every `stride`th
    * of nFrames), frame payload sliced deterministically from the body.
    * flatMap — output can exceed input; frames of one asset stay in its
    * partition.
    */
  def sampleFrames(assets: Dataset[Asset], stride: Int = 2): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.flatMap { a =>
      // same kind+signature dispatch as decode/extractFeatures/resize —
      // a record must take one consistent path across ALL operators
      if ((a.kind == "image" && Codec.isImage(a.payload)) ||
          (a.kind == "audio" && Codec.isWav(a.payload))) {
        // a still image / a single audio clip is its own one frame
        Seq(Frame(a.asset_id, 0, a.payload))
      } else if (a.kind == "video" && Codec.isGif(a.payload)) {
        // real frame sampling: every strideth GIF frame, each re-encoded
        // as a standalone PNG (lossless, single-frame container)
        val frames = Codec.readGifFrames(a.payload)
        (0 until frames.length by stride).map { f =>
          Frame(a.asset_id, f, Codec.writePng(frames(f)))
        }
      } else if (a.kind == "video" && Codec.isMp4(a.payload)) {
        // real container demux: every strideth SAMPLE (encoded access
        // unit) extracted via the stsz/stsc/stco tables — exactly the
        // bytes a downstream GPU decoder consumes; no pixel decode
        val v = Codec.readMp4Video(a.payload)
        (0 until v.sampleSizes.length by stride).map { f =>
          val start = v.sampleOffsets(f)
          Frame(a.asset_id, f, java.util.Arrays.copyOfRange(
            a.payload, start.toInt, start.toInt + v.sampleSizes(f)))
        }
      } else {
      val m = FakeCodec.decode(a.kind, a.payload)
      val body = a.payload.length - FakeCodec.HeaderLen
      val perFrame = math.max(1, body / math.max(1, m.nFrames))
      (0 until m.nFrames by stride).map { f =>
        val start = FakeCodec.HeaderLen + f * perFrame
        val end = math.min(a.payload.length, start + perFrame)
        Frame(a.asset_id, f, java.util.Arrays.copyOfRange(a.payload, start, end))
      }
      }
    })
  }

  /** One 64-bit perceptual signature per asset, in the SimHash 4×16-bit
    * chunk layout. */
  final case class ChunkSig(asset_id: Long, phash: Array[Int])

  /** The 9-wide × 8-high luminance grid a [[dHash]] is computed from. */
  private def gridLum(img: java.awt.image.BufferedImage): Array[Int] = {
    val g = rescale(img, 9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new Array[Int](72)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 9) {
        val rgb = g.getRGB(x, y)
        out(y * 9 + x) = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
          (rgb & 0xFF) * 114) / 1000
        x += 1
      }
      y += 1
    }
    out
  }

  /** 64-bit perceptual difference-hash (dHash) per asset: decode,
    * bilinear-downsample to a 9×8 luminance grid, and set bit (y,x)
    * iff the pixel is darker than its right neighbor — the classic
    * row-gradient fingerprint, robust to resizing/re-encoding/small
    * edits because gradients survive what raw pixels don't. Returned
    * in the SimHash 4×16-bit chunk layout (chunk 0 = the 16 highest
    * bits), so image near-dup rides the SAME pigeonhole chunk
    * equi-join as text SimHash ([[Dedup.nearDupChunkSigs]]): Hamming
    * ≤ 3 candidates collide on at least one chunk, never all-pairs.
    *
    * Real images hash their pixels; GIF videos hash their first frame
    * (a video-level hash would want per-frame signatures — that's
    * [[sampleFrames]] + this); GRFT and other undecodable payloads
    * hash their body bytes laid out as the 9×8 grid directly — the
    * deterministic stand-in keeping the pipeline testable without
    * codecs. Scale shape: one narrow mapPartitions, payloads never
    * shuffle; only (id, 16-byte signature) leaves the scan.
    */
  /** Byte range laid out as the 9×8 luminance grid — the deterministic
    * stand-in for payloads with no pixel decoder (GRFT bodies, encoded
    * MP4 access units): byte i is cell i, short ranges zero-pad.
    */
  private def byteGrid(payload: Array[Byte], start: Int, end: Int): Array[Int] = {
    val out = new Array[Int](72)
    var i = 0
    while (i < 72) {
      out(i) = if (start + i < end && start + i < payload.length)
        payload(start + i) & 0xFF else 0
      i += 1
    }
    out
  }

  /** The dHash bit computation on a 9×8 luminance grid, in the SimHash
    * 4×16-bit chunk layout (chunk 0 = the 16 highest bits).
    */
  private def dhashChunks(lum: Array[Int]): Array[Int] = {
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        bits = (bits << 1) | (if (lum(y * 9 + x) < lum(y * 9 + x + 1)) 1L else 0L)
        x += 1
      }
      y += 1
    }
    Array.tabulate(4)(c => ((bits >>> (48 - 16 * c)) & 0xFFFF).toInt)
  }

  def dHash(assets: Dataset[Asset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val lum: Array[Int] =
        if (a.kind == "image" && Codec.isImage(a.payload))
          gridLum(Codec.readImage(a.payload))
        else if (a.kind == "video" && Codec.isGif(a.payload))
          gridLum(Codec.readGifFrames(a.payload).head)
        else {
          // skip the GRFT header unconditionally (any kind): the hash
          // must cover body bytes, not magic/kind/dims — matching
          // audioHash and the documented contract
          val start = if (a.payload.length >= FakeCodec.HeaderLen &&
            ByteBuffer.wrap(a.payload, 0, 4).getInt == FakeCodec.Magic) FakeCodec.HeaderLen else 0
          byteGrid(a.payload, start, a.payload.length)
        }
      ChunkSig(a.asset_id, dhashChunks(lum))
    }).toDF()
  }

  /** Near-duplicate IMAGE pairs: [[dHash]] signatures through the
    * chunked Hamming join — (a_id, b_id, hamming) with hamming ≤
    * maxHamming, complete for maxHamming ≤ 3. The end-to-end
    * multimodal dedup: near-identical images (re-encodes, small
    * overlays, slight crops) collide while distinct images stay
    * apart; MultimodalSpec verifies the planted pairs against
    * brute-force pixel distance.
    */
  def nearDupImages(assets: Dataset[Asset], maxHamming: Int = 3): DataFrame =
    Dedup.nearDupChunkSigs(materializedSigs(dHash(assets)),
      "asset_id", "phash", maxHamming)

  /** Decode ONCE, join many: the chunked Hamming self-join consumes its
    * signature frame on both join sides (and [[nearDupVideos]] adds a
    * per-clip frame count), so an unmaterialized lineage would re-run
    * the payload-decoding `mapPartitions` once per plan branch — the
    * batch-side mirror of the streaming sink's hashed-ONCE cache
    * (`streaming/StreamingDedup.scala`, `multimodalSinkBatch`). An
    * eager local checkpoint materializes the tiny signature rows
    * (id + 16 bytes; payloads are NOT carried) and truncates the
    * decode lineage. Executor-loss recovery is the documented
    * [[Dedup.connectedComponents]] trade; the durable 100 TB path is
    * the persisted parquet signature index (q83's shape), where the
    * decode runs exactly once by construction.
    */
  private def materializedSigs(sigs: DataFrame): DataFrame =
    sigs.localCheckpoint(true)

  /** One 64-bit signature per SAMPLED FRAME of a video asset — the
    * frame-level fingerprint family that closes the modality matrix
    * (text SimHash / image dHash / audio gradient hash are one
    * signature per asset; video needs one per frame because two clips
    * relate through their frame SETS, not a single hash). Same frame
    * dispatch as [[sampleFrames]]: GIF videos dHash every `stride`th
    * DECODED frame's pixels; MP4 videos hash every `stride`th demuxed
    * access unit's BYTES (no pixel decoder in this environment — the
    * byte grid is the documented stand-in, deterministic on the exact
    * encoded bytes); GRFT payloads hash per-frame body slices.
    * Non-video kinds are ignored (images/audio have their own
    * single-signature families).
    *
    * Scale shape: one narrow mapPartitions; payloads never shuffle —
    * only (id, frame_idx, 16-byte signature) leaves the scan, ~24
    * bytes per sampled frame.
    */
  def videoFrameSigs(assets: Dataset[Asset], stride: Int = 2): DataFrame = {
    import assets.sparkSession.implicits._
    require(stride >= 1, s"stride must be >= 1, got $stride")
    assets.filter(_.kind == "video").mapPartitions(_.flatMap { a =>
      val grids: Seq[(Int, Array[Int])] =
        if (Codec.isGif(a.payload)) {
          val frames = Codec.readGifFrames(a.payload)
          (0 until frames.length by stride).map(f => f -> gridLum(frames(f)))
        } else if (Codec.isMp4(a.payload)) {
          val v = Codec.readMp4Video(a.payload)
          (0 until v.sampleSizes.length by stride).map { f =>
            val start = v.sampleOffsets(f).toInt
            f -> byteGrid(a.payload, start, start + v.sampleSizes(f))
          }
        } else {
          val m = FakeCodec.decode(a.kind, a.payload)
          val body = a.payload.length - FakeCodec.HeaderLen
          val perFrame = math.max(1, body / math.max(1, m.nFrames))
          (0 until m.nFrames by stride).map { f =>
            val start = FakeCodec.HeaderLen + f * perFrame
            f -> byteGrid(a.payload, start,
              math.min(a.payload.length, start + perFrame))
          }
        }
      grids.map { case (f, g) => FrameSig(a.asset_id, f, dhashChunks(g)) }
    }).toDF()
  }

  /** One row per sampled video frame with its 64-bit chunked dHash. */
  final case class FrameSig(asset_id: Long, frame_idx: Int, phash: Array[Int])

  /** Near-duplicate VIDEO pairs: re-encodes, trims, and small edits of
    * a clip share most sampled-frame fingerprints, so two videos are
    * near-dups when ≥ `minMatchFrac` of the shorter clip's sampled
    * frames have a ≤ `maxHamming` counterpart in the other clip.
    * Frame-level candidates ride the SAME pigeonhole chunk equi-join
    * as every other 64-bit family (a ≤ 3-Hamming frame pair agrees on
    * one of its 4 chunks — never all-pairs, and never order-sensitive,
    * so a trimmed/offset clip still matches); the per-pair aggregation
    * then counts DISTINCT matched frames of the a-side.
    *
    * Output: (a_id, b_id, matched_frames, n_frames_a, n_frames_b)
    * with a_id < b_id. Scale shape: the chunk join shuffles ~24-byte
    * frame rows; the aggregation groups on (a_id, b_id) — state is
    * one count per COLLIDING clip pair, never quadratic in clips.
    */
  def nearDupVideos(assets: Dataset[Asset], stride: Int = 2,
                    maxHamming: Int = 3,
                    minMatchFrac: Double = 0.5): DataFrame = {
    require(minMatchFrac > 0 && minMatchFrac <= 1,
      s"minMatchFrac must be in (0, 1], got $minMatchFrac")
    // three consumers (both chunk-join sides + the per-clip frame
    // count) — decode once, see materializedSigs
    val sigs = materializedSigs(videoFrameSigs(assets, stride))
    val chunks = sigs.select(col("asset_id"), col("frame_idx"), col("phash"),
      posexplode(col("phash")).as(Seq("chunk_idx", "chunk_value")))
    val a = chunks.select(col("chunk_idx"), col("chunk_value"),
      col("asset_id").as("a_id"), col("frame_idx").as("a_frame"),
      col("phash").as("__siga"))
    val b = chunks.select(col("chunk_idx"), col("chunk_value"),
      col("asset_id").as("b_id"), col("frame_idx").as("b_frame"),
      col("phash").as("__sigb"))
    val framePairs = a.join(b, Seq("chunk_idx", "chunk_value"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_frame"), col("b_frame"),
        Dedup.hammingDistance(col("__siga"), col("__sigb")).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
    val matches = framePairs.groupBy("a_id", "b_id")
      .agg(count_distinct(col("a_frame")).as("matched_frames"))
    val counts = sigs.groupBy("asset_id").agg(count(lit(1)).as("n_frames"))
    matches
      .join(counts.select(col("asset_id").as("a_id"),
        col("n_frames").as("n_frames_a")), Seq("a_id"))
      .join(counts.select(col("asset_id").as("b_id"),
        col("n_frames").as("n_frames_b")), Seq("b_id"))
      .where(col("matched_frames") >=
        ceil(least(col("n_frames_a"), col("n_frames_b")) * lit(minMatchFrac)))
      .select("a_id", "b_id", "matched_frames", "n_frames_a", "n_frames_b")
  }

  /** Mean-abs amplitude per window, n samples split into `w` windows
    * (the audio analogue of the 9×8 pixel grid): window k covers
    * samples [k·n/w, (k+1)·n/w) via the i·w/n mapping, each normalized
    * by its own exact sample count so the off-by-one window sizes
    * can't tilt the gradients.
    */
  private def windowMeans(w: Int, n: Int, sample: Int => Double): Array[Double] = {
    val sums = new Array[Double](w)
    val counts = new Array[Int](w)
    var i = 0
    while (i < n) {
      val k = (i.toLong * w / n).toInt
      sums(k) += sample(i)
      counts(k) += 1
      i += 1
    }
    var k = 0
    while (k < w) {
      if (counts(k) > 0) sums(k) /= counts(k)
      k += 1
    }
    sums
  }

  private def gradientBitsToChunks(vals: Array[Double]): Array[Int] = {
    var bits = 0L
    var i = 0
    while (i < vals.length - 1) {
      bits = (bits << 1) | (if (vals(i) < vals(i + 1)) 1L else 0L)
      i += 1
    }
    Array.tabulate(4)(c => ((bits >>> (48 - 16 * c)) & 0xFFFF).toInt)
  }

  /** 64-bit perceptual AUDIO hash: decode, split the clip into 65
    * windows, take mean absolute amplitude per window, and set bit k
    * iff window k is quieter than window k+1 — the envelope-gradient
    * fingerprint, the audio analogue of [[dHash]] (robust to gain
    * changes and re-encoding because energy GRADIENTS survive what
    * raw samples don't). Same 4×16-bit chunk layout, same pigeonhole
    * chunk join. Real WAV decodes via javax.sound with the format
    * dispatched like [[extractFeatures]] (16-bit signed, 8-bit
    * unsigned, raw-byte fallback for exotic encodings); GRFT and
    * other undecodable payloads hash their body bytes — the
    * deterministic stand-in. Narrow mapPartitions, payloads never
    * shuffle.
    */
  def audioHash(assets: Dataset[Asset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val means: Array[Double] =
        if (a.kind == "audio" && Codec.isWav(a.payload)) {
          import javax.sound.sampled.AudioFormat.Encoding
          val (fmt, pcm) = Codec.readWav(a.payload)
          if (fmt.getEncoding == Encoding.PCM_SIGNED && fmt.getSampleSizeInBits == 16) {
            val n = pcm.length / 2
            val le = !fmt.isBigEndian
            windowMeans(65, n, i => {
              val lo = pcm(2 * i) & 0xFF
              val hi = pcm(2 * i + 1) & 0xFF
              math.abs((if (le) (hi << 8) | lo else (lo << 8) | hi).toShort.toDouble)
            })
          } else if (fmt.getEncoding == Encoding.PCM_UNSIGNED && fmt.getSampleSizeInBits == 8)
            windowMeans(65, pcm.length, i => math.abs((pcm(i) & 0xFF) - 128.0))
          else
            windowMeans(65, pcm.length, i => (pcm(i) & 0xFF).toDouble)
        } else {
          val start = if (a.payload.length >= FakeCodec.HeaderLen &&
            ByteBuffer.wrap(a.payload, 0, 4).getInt == FakeCodec.Magic) FakeCodec.HeaderLen else 0
          windowMeans(65, math.max(0, a.payload.length - start),
            i => (a.payload(start + i) & 0xFF).toDouble)
        }
      ChunkSig(a.asset_id, gradientBitsToChunks(means))
    }).toDF()
  }

  /** Near-duplicate AUDIO pairs: [[audioHash]] through the chunked
    * Hamming join — same contract as [[nearDupImages]] for the audio
    * modality (re-encodes, gain changes, light noise collide;
    * different material stays apart).
    */
  def nearDupAudio(assets: Dataset[Asset], maxHamming: Int = 3): DataFrame =
    Dedup.nearDupChunkSigs(materializedSigs(audioHash(assets)),
      "asset_id", "phash", maxHamming)

  /** Deterministic text → real-PNG rendering: the document's UTF-8
    * bytes laid out as the 9×8 grayscale pixel grid, PNG-encoded via
    * ImageIO. The registry's bridge from the text testdata to the
    * image dedup path (q82): near-dup DOCUMENTS render to
    * near-identical IMAGES, so the image near-dup finds real planted
    * structure while exercising the genuine PNG encode→decode→
    * downsample→hash pipeline.
    */
  def renderTextImage(text: String): Array[Byte] =
    Codec.writePng(renderTextFrame(text.getBytes("UTF-8"), 0))

  /** One 9×8 grayscale frame from byte window [off, off+72) of `bytes`
    * (zero-padded past the end) — the shared raster of
    * [[renderTextImage]] (off = 0) and [[renderTextGif]].
    */
  private def renderTextFrame(bytes: Array[Byte], off: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < 72) {
      val v = if (off + i < bytes.length) bytes(off + i) & 0xFF else 0
      img.setRGB(i % 9, i / 9, (v << 16) | (v << 8) | v)
      i += 1
    }
    img
  }

  /** Deterministic animated GIF from a document: frame f rasterizes
    * byte window [9·f, 9·f + 72) — consecutive frames overlap by 7 of
    * 8 rows, a scrolling read of the text. The registry's bridge from
    * the text testdata to the VIDEO near-dup path (q89, the q82
    * pattern one modality up): near-dup documents render to clips
    * sharing most frames, so [[nearDupVideos]] finds real planted
    * structure while exercising the genuine GIF encode → multi-frame
    * decode → per-frame dHash pipeline.
    */
  def renderTextGif(text: String, nFrames: Int = 4): Array[Byte] = {
    val bytes = text.getBytes("UTF-8")
    Codec.writeGif((0 until nFrames).map(f => renderTextFrame(bytes, 9 * f)))
  }

  /** Metadata facet profile of an asset table — the typed-metadata side
    * of the contract: group on small decoded columns, payloads pruned
    * from the scan entirely.
    */
  def assetStats(decoded: Dataset[Decoded]): DataFrame =
    decoded.groupBy(col("kind"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("payloadBytes")).as("total_bytes"),
        avg(col("width")).as("avg_width"),
        max(col("nFrames")).as("max_frames"))
      .orderBy("kind")
}
