package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video ride through the lake as opaque `binary` columns with typed
  * metadata, and per-item feature extraction runs as partition-iterator
  * batches (the Scala analog of `mapInPandas` batching — one JVM-side
  * iterator per partition, no per-row task overhead).
  *
  * The codec is a pluggable seam ([[MediaCodec]]):
  *
  *  - [[ImageIoCodec]] decodes REAL image bytes (PNG/JPEG/BMP/GIF via
  *    the JDK's own `javax.imageio` — zero external deps) into an 8×8
  *    block-luma feature grid, plus real resample (`Graphics2D`) and a
  *    one-pixel perturbation for planted near-dup verification.
  *  - [[WavCodec]] decodes REAL audio bytes: `javax.sound.sampled`
  *    (java.desktop module, in every JDK) reads PCM WAV/AIFF/AU, and
  *    the stats face emits duration / RMS energy / zero-crossing count
  *    / peak amplitude — exact integers a planted square wave makes
  *    closed-form, so the board oracle is value-carrying.
  *  - [[MjpegCodec]] decodes REAL video bytes (round 16 — the engine's
  *    last stub deleted): MJPEG-in-AVI, demuxed by a pure-JDK RIFF
  *    chunk walk (AVI is the same container family WavCodec's WAV
  *    lives in) with each `00dc` frame decoded by the m3–m5
  *    `javax.imageio` path. Modern inter-frame codecs (H.264/VP9/AV1)
  *    have no JDK decoder and stay out of scope — a production build
  *    swaps this object for a JavaCV-backed one; motion-JPEG is the
  *    classic capture/test format and is fully decodable with what
  *    the JDK ships.
  */
object Multimodal {

  /** The codec seam: bytes in, fixed-dim feature vector out (None =
    * corrupt/undecodable). Implementations must be Serializable — they
    * ride inside `mapPartitions` closures to the executors.
    */
  trait MediaCodec extends Serializable {
    def featureDim: Int
    def decode(payload: Array[Byte]): Option[Array[Float]]
  }

  /** One media item: payload is the opaque binary column; metadata is the
    * typed face the catalog sees.
    */
  final case class MediaItem(
      media_id: Long, kind: String, format: String,
      width: Int, height: Int, duration_ms: Long,
      payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      sha256: String, feature: Array[Float], decode_ok: Boolean)


  /** REAL image codec on the JDK's own `javax.imageio` (PNG/JPEG/BMP/GIF
    * readers ship in every JRE — no external deps). Feature = the
    * classic perceptual-hash input: decode, average luma
    * (0.299R+0.587G+0.114B, normalized to [0,1]) over an 8×8 grid of
    * equal pixel blocks → 64 floats. Block averaging (not point
    * sampling) makes the feature locality-sensitive: a one-pixel edit
    * moves exactly one cell by ≤ delta/blockPixels, so [[perceptualHash]]
    * over these features flips at most a couple of bits — the property
    * [[mediaNearDups]] banding relies on. Undecodable / truncated /
    * zero-size images → None, surfaced as `decode_ok = false`.
    *
    * `ImageIO` instances are not thread-safe to share, but the static
    * `read`/`write` entry points used here create per-call readers and
    * disk caching is disabled once per JVM (executor threads each call
    * into their own stream).
    */
  object ImageIoCodec extends MediaCodec {
    val grid = 8
    val featureDim: Int = grid * grid

    // imageio's default temp-file cache is pure overhead for in-memory
    // byte arrays (and writes to a scratch dir executors may not own)
    javax.imageio.ImageIO.setUseCache(false)

    private def readImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (payload == null || payload.length == 0) None
      else try {
        Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload)))
          .filter(im => im.getWidth > 0 && im.getHeight > 0)
      } catch { case _: java.io.IOException => None }

    def decode(payload: Array[Byte]): Option[Array[Float]] =
      readImage(payload).map { im =>
        val (w, h) = (im.getWidth, im.getHeight)
        val sums = new Array[Double](featureDim)
        val counts = new Array[Long](featureDim)
        var y = 0
        while (y < h) {
          val cy = math.min(grid - 1, y * grid / h)
          var x = 0
          while (x < w) {
            val cell = cy * grid + math.min(grid - 1, x * grid / w)
            val rgb = im.getRGB(x, y)
            sums(cell) += 0.299 * ((rgb >> 16) & 0xFF) +
              0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
            counts(cell) += 1
            x += 1
          }
          y += 1
        }
        Array.tabulate(featureDim)(c =>
          if (counts(c) == 0) 0f else (sums(c) / counts(c) / 255.0).toFloat)
      }

    /** Encode an RGB pixel grid as PNG bytes (deterministic: PNG is
      * lossless and the JDK encoder is stable for equal pixel data).
      */
    def encodePng(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { im.setRGB(x, y, rgb(x, y)); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }

    /** Encode a BufferedImage as JPEG at an EXPLICIT quality (the
      * static `ImageIO.write(im, "jpeg", …)` entry point hides the
      * quality knob). quality = 1.0 sets all-ones quantization tables,
      * under which a CONSTANT-gray frame round-trips EXACTLY: a flat
      * 8×8 block has only its DC coefficient (an integer — quantizing
      * by 1 is lossless), and the grayscale YCbCr conversion is the
      * identity on r=g=b pixels — MultimodalSpec pins the exact
      * round-trip for all 256 gray levels, the property
      * [[MjpegCodec]]'s value-carrying luma oracle stands on.
      */
    def encodeJpeg(im: java.awt.image.BufferedImage,
        quality: Float = 1.0f): Array[Byte] = {
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val p = w.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        w.setOutput(ios)
        w.write(null, new javax.imageio.IIOImage(im, null, null), p)
      } finally { ios.close(); w.dispose() }
      bos.toByteArray
    }

    /** Real resample: decode, `Graphics2D` bilinear scale to w×h,
      * re-encode PNG. None when the payload does not decode.
      */
    def resize(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      readImage(payload).map { im =>
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(im, 0, 0, w, h, null); ()
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }

    /** One-pixel perturbation IN PIXEL SPACE (decode, nudge pixel (0,0)'s
      * red channel by ±16, re-encode) — the planted-near-dup edit for
      * real images. Flipping a raw payload byte (the byte-space
      * [[perturb]]) would corrupt a PNG signature or a deflate stream
      * rather than edit the picture; this keeps the file valid and the
      * visual change minimal. None when the payload does not decode.
      */
    def perturbPixel(payload: Array[Byte]): Option[Array[Byte]] =
      readImage(payload).map { im =>
        val rgb = im.getRGB(0, 0)
        val r0 = (rgb >> 16) & 0xFF
        val r1 = if (r0 >= 240) r0 - 16 else r0 + 16
        im.setRGB(0, 0, (rgb & 0x00FFFF) | (r1 << 16))
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(im, "png", bos)
        bos.toByteArray
      }
  }

  /** REAL audio codec on the JDK's own `javax.sound.sampled`
    * (java.desktop module — no external deps): decodes the PCM
    * WAV/AIFF/AU containers the platform ships readers for. Compressed
    * codecs (MP3/AAC/Opus) and sample-rate conversion have no JDK
    * surface — those would need an external lib and stay out of scope;
    * video's MJPEG-in-AVI face is [[MjpegCodec]].
    *
    * The primary face is [[decodeStats]]: exact integer statistics of
    * the PCM stream (sample count, peak |amplitude|, zero crossings,
    * sum of squares) — every one closed-form for a planted square wave,
    * which is what makes the board oracle value-carrying instead of a
    * postcondition. The [[MediaCodec]] face derives a 4-float feature
    * vector from the same stats so audio rides the identical
    * partition-iterator plumbing as images.
    *
    * Zero-crossing convention, stated because ±0 matters: a crossing is
    * counted between consecutive samples OF THE SAME CHANNEL when
    * `(prev >= 0) != (cur >= 0)`; multi-channel streams de-interleave
    * and sum the per-channel counts. Truncated payloads (header frame
    * count ≠ bytes present) decode to None rather than silently
    * yielding stats over a prefix.
    */
  object WavCodec extends MediaCodec {

    /** Exact integer statistics of a decoded PCM stream. `nSamples`
      * counts ALL samples across channels (frames × channels);
      * `durationMs` = frames·1000 DIV rate (truncating — the integer
      * contract oracles replay); `sumSq` is exact (peak 32767² ≈ 10⁹
      * per sample — overflow needs ~8·10⁹ samples, a 4-hour 48 kHz
      * stereo file is 10⁹).
      */
    final case class AudioStats(nSamples: Long, channels: Int,
        sampleRate: Int, durationMs: Long, peakAbs: Long,
        zeroCrossings: Long, sumSq: Long)

    def decodeStats(payload: Array[Byte]): Option[AudioStats] = {
      if (payload == null || payload.length == 0) return None
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = ais.getFormat
          if (fmt.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
              fmt.getSampleSizeInBits != 16 || fmt.getChannels < 1)
            return None
          val bytes = ais.readAllBytes()
          // a truncated file parses its header fine but delivers fewer
          // frames than declared — stats over the prefix would wear the
          // full file's label, so refuse instead. A stream REPORTING no
          // frame length (-1, legal for AudioInputStream; reachable via
          // an AU header with the unknown-size sentinel 0xFFFFFFFF) is
          // refused too: with no declared length the truncation check
          // cannot run, and "probably complete" is not a contract this
          // decoder sells (round-15 advisory — WAV always reports, so
          // the WAV path never hits this arm; MultimodalSpec pins the
          // AU case)
          if (ais.getFrameLength < 0 ||
              bytes.length != ais.getFrameLength * fmt.getFrameSize)
            return None
          val ch = fmt.getChannels
          val big = fmt.isBigEndian
          val prev = new Array[Int](ch)
          val hasPrev = new Array[Boolean](ch)
          var i = 0; var idx = 0
          var peak = 0L; var sumSq = 0L; var zc = 0L
          while (i + 1 < bytes.length) {
            val s =
              if (big) (bytes(i).toInt << 8) | (bytes(i + 1) & 0xFF)
              else (bytes(i + 1).toInt << 8) | (bytes(i) & 0xFF)
            val c = idx % ch
            if (hasPrev(c) && ((prev(c) >= 0) != (s >= 0))) zc += 1
            prev(c) = s; hasPrev(c) = true
            val a = math.abs(s.toLong); if (a > peak) peak = a
            sumSq += s.toLong * s
            idx += 1; i += 2
          }
          val rate = fmt.getSampleRate.toInt
          if (rate <= 0 || idx == 0) return None
          val frames = (idx / ch).toLong
          Some(AudioStats(idx.toLong, ch, rate, frames * 1000L / rate,
            peak, zc, sumSq))
        } finally ais.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }
    }

    /** Encode interleaved 16-bit PCM samples as a WAV container via
      * `AudioSystem.write` — the encode half of the same JDK surface
      * the decoder uses, so round-trip fidelity is the API's own
      * contract, not this code's.
      */
    def encodeWavPcm16(sampleRate: Int, samples: Array[Short],
        channels: Int = 1): Array[Byte] = {
      require(channels >= 1 && samples.length % channels == 0,
        s"encodeWavPcm16: ${samples.length} samples do not divide into " +
          s"$channels channel(s)")
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate.toFloat, 16, channels, true, false)
      val bytes = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        bytes(2 * i) = (samples(i) & 0xFF).toByte
        bytes(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
        i += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt,
        (samples.length / channels).toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** [[MediaCodec]] face: [duration_s, rms/2¹⁵, crossings/sample,
      * peak/2¹⁵] — audio rides the same partition-iterator feature
      * plumbing (and pHash/near-dup machinery) as images.
      */
    val featureDim = 4

    def decode(payload: Array[Byte]): Option[Array[Float]] =
      decodeStats(payload).map { s =>
        val n = math.max(1L, s.nSamples)
        Array(
          s.durationMs / 1000.0f,
          (math.sqrt(s.sumSq.toDouble / n) / 32768.0).toFloat,
          s.zeroCrossings.toFloat / n,
          s.peakAbs / 32768.0f)
      }
  }

  /** REAL video codec, pure JDK: MJPEG-in-AVI. AVI is a RIFF container
    * (the family WavCodec's WAV lives in): a `hdrl` LIST carries the
    * main (`avih`) and stream (`strh`) headers, a `movi` LIST carries
    * the frames, and in motion-JPEG each `00dc`/`00db` chunk is a
    * complete JPEG — so demuxing is a ~60-line chunk walk and frame
    * decoding is the `javax.imageio` path m3–m5 already use. Reference
    * format: Microsoft AVI RIFF spec (public); the writer below emits
    * the canonical hdrl/movi/idx1 layout with little-endian sizes and
    * even-byte chunk padding.
    *
    * REFUSAL CONTRACT (the WavCodec discipline — stats over a prefix
    * must never wear the full file's label): decode returns None when
    * the RIFF size overruns the payload (truncated tail), any chunk
    * overruns its enclosing region, the header is missing, the header
    * frame count differs from the `movi` chunks actually present (a
    * lying/truncated index), any frame fails JPEG decode, or any
    * frame's decoded dimensions differ from the header's. Corrupt rows
    * are FLAGGED (decode_ok = false), never dropped.
    *
    * [[VideoStats]] is integer-exact: fps = rate DIV scale and
    * duration_ms = frames·1000·scale DIV rate (truncating — the
    * integer contract oracles replay); per-frame mean luma =
    * Σ(299·R + 587·G + 114·B) DIV (1000·w·h) (truncating). On the
    * planted CONSTANT-gray frames of [[syntheticVideos]] every one of
    * these is closed-form in the id — quality-1.0 JPEG round-trips a
    * flat frame exactly (see [[ImageIoCodec.encodeJpeg]]) — which is
    * what makes the m7 board oracle value-carrying rather than a
    * postcondition.
    */
  object MjpegCodec extends MediaCodec {

    /** Exact integer statistics of a decoded MJPEG video. `lumaFirst` /
      * `lumaSum` are the truncating per-frame mean lumas (first frame /
      * summed over frames) documented on the object.
      */
    final case class VideoStats(nFrames: Long, width: Long, height: Long,
        fps: Long, durationMs: Long, lumaFirst: Long, lumaSum: Long)

    private[operators] final case class AviParsed(totalFrames: Int,
        width: Int, height: Int, scale: Int, rate: Int,
        frames: Vector[Array[Byte]])

    private def fourcc(p: Array[Byte], off: Long): String =
      new String(p, off.toInt, 4, java.nio.charset.StandardCharsets.US_ASCII)

    private def u32(p: Array[Byte], off: Long): Long =
      (p(off.toInt) & 0xFFL) | ((p(off.toInt + 1) & 0xFFL) << 8) |
        ((p(off.toInt + 2) & 0xFFL) << 16) | ((p(off.toInt + 3) & 0xFFL) << 24)

    /** RIFF walk: headers + raw JPEG frame bytes, or None on any
      * structural violation (see the refusal contract). Offsets ride
      * Longs — chunk sizes are untrusted u32s, so arithmetic must not
      * wrap before the bounds check.
      */
    private[operators] def parseAvi(payload: Array[Byte]): Option[AviParsed] = {
      if (payload == null || payload.length < 12) return None
      if (fourcc(payload, 0) != "RIFF" || fourcc(payload, 8) != "AVI ")
        return None
      val riffEnd = 8L + u32(payload, 4)
      if (riffEnd > payload.length) return None // truncated container
      var avih: Option[(Int, Int)] = None      // totalFrames, (w, h) below
      var dims: Option[(Int, Int)] = None
      var strh: Option[(Int, Int)] = None      // scale, rate of the vids stream
      val frames = Vector.newBuilder[Array[Byte]]
      def walk(start: Long, end: Long): Boolean = {
        var off = start
        while (off + 8 <= end) {
          val id = fourcc(payload, off)
          val sz = u32(payload, off + 4)
          val dataEnd = off + 8 + sz
          if (dataEnd > end) return false // chunk overruns its region
          id match {
            case "LIST" =>
              if (sz < 4) return false
              val lt = fourcc(payload, off + 8)
              if ((lt == "hdrl" || lt == "strl" || lt == "movi" ||
                  lt == "rec ") && !walk(off + 12, dataEnd)) return false
            case "avih" =>
              if (sz < 56) return false
              avih = Some((u32(payload, off + 8 + 16).toInt, 0))
              dims = Some((u32(payload, off + 8 + 32).toInt,
                u32(payload, off + 8 + 36).toInt))
            case "strh" =>
              if (sz < 56) return false
              if (fourcc(payload, off + 8) == "vids")
                strh = Some((u32(payload, off + 8 + 20).toInt,
                  u32(payload, off + 8 + 24).toInt))
            case "00dc" | "00db" =>
              frames += java.util.Arrays.copyOfRange(
                payload, (off + 8).toInt, dataEnd.toInt)
            case _ => () // idx1, JUNK, vendor chunks: skipped, not errors
          }
          off = dataEnd + (sz & 1L) // chunks pad to even offsets
        }
        true
      }
      if (!walk(12L, riffEnd)) return None
      val fs = frames.result()
      for {
        (total, _) <- avih
        (w, h) <- dims
        (scale, rate) <- strh
        if total > 0 && fs.size == total && scale > 0 && rate > 0 &&
          w > 0 && h > 0
      } yield AviParsed(total, w, h, scale, rate, fs)
    }

    /** Raw per-frame JPEG bytes in stream order — the demux-only face
      * [[sampleVideoFrames]] fans out on (each element decodes with the
      * m3–m5 image path). None under the same refusal contract.
      */
    def decodeFrames(payload: Array[Byte]): Option[Vector[Array[Byte]]] =
      parseAvi(payload).map(_.frames)

    def decodeStats(payload: Array[Byte]): Option[VideoStats] =
      parseAvi(payload).flatMap { p =>
        var lumaFirst = 0L
        var lumaSum = 0L
        var ok = true
        var i = 0
        while (ok && i < p.frames.size) {
          val im = try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(p.frames(i))))
            catch { case _: java.io.IOException => None }
          im match {
            case Some(f) if f.getWidth == p.width && f.getHeight == p.height =>
              var s = 0L
              var y = 0
              while (y < p.height) {
                var x = 0
                while (x < p.width) {
                  val rgb = f.getRGB(x, y)
                  s += 299L * ((rgb >> 16) & 0xFF) +
                    587L * ((rgb >> 8) & 0xFF) + 114L * (rgb & 0xFF)
                  x += 1
                }
                y += 1
              }
              val mean = s / (1000L * p.width * p.height)
              if (i == 0) lumaFirst = mean
              lumaSum += mean
            case _ => ok = false // undecodable frame or dims lie
          }
          i += 1
        }
        if (!ok) None
        else Some(VideoStats(p.totalFrames.toLong, p.width.toLong,
          p.height.toLong, (p.rate / p.scale).toLong,
          p.totalFrames.toLong * 1000L * p.scale / p.rate,
          lumaFirst, lumaSum))
      }

    /** MJPEG-in-AVI writer: JPEG frame bytes in, a spec-shaped AVI out
      * (RIFF / LIST hdrl [avih + LIST strl [strh + strf]] / LIST movi
      * [00dc…] / idx1). `declaredFrames` deliberately mis-states the
      * header frame count — the spec fixture for the lying-header
      * refusal; production callers leave it None.
      */
    def encodeAvi(width: Int, height: Int, fps: Int,
        frames: Seq[Array[Byte]],
        declaredFrames: Option[Int] = None): Array[Byte] = {
      require(fps > 0, s"encodeAvi: fps must be positive, got $fps")
      require(frames.nonEmpty, "encodeAvi: no frames")
      def pad(n: Int): Int = n + (n & 1)
      val strlSize = 4 + (8 + 56) + (8 + 40)          // 'strl' + strh + strf
      val hdrlSize = 4 + (8 + 56) + (8 + strlSize)    // 'hdrl' + avih + LIST strl
      val moviSize = 4 + frames.map(f => 8 + pad(f.length)).sum
      val idx1Size = 16 * frames.length
      val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)
      val maxBuf = frames.map(_.length).max + 8
      val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fcc(s: String): Unit = { bb.put(s.getBytes(
        java.nio.charset.StandardCharsets.US_ASCII)); () }
      fcc("RIFF"); bb.putInt(riffSize); fcc("AVI ")
      fcc("LIST"); bb.putInt(hdrlSize); fcc("hdrl")
      fcc("avih"); bb.putInt(56)
      bb.putInt(1000000 / fps)  // dwMicroSecPerFrame (informational)
      bb.putInt(0); bb.putInt(0)
      bb.putInt(0x10)           // AVIF_HASINDEX
      bb.putInt(declaredFrames.getOrElse(frames.length))
      bb.putInt(0); bb.putInt(1) // initial frames, stream count
      bb.putInt(maxBuf)
      bb.putInt(width); bb.putInt(height)
      (0 until 4).foreach(_ => bb.putInt(0))
      fcc("LIST"); bb.putInt(strlSize); fcc("strl")
      fcc("strh"); bb.putInt(56)
      fcc("vids"); fcc("MJPG")
      bb.putInt(0); bb.putShort(0); bb.putShort(0)
      bb.putInt(0)
      bb.putInt(1); bb.putInt(fps) // dwScale, dwRate: fps = rate/scale
      bb.putInt(0)
      bb.putInt(frames.length)     // dwLength, in frames
      bb.putInt(maxBuf)
      bb.putInt(-1); bb.putInt(0)  // default quality, variable sample size
      bb.putShort(0); bb.putShort(0)
      bb.putShort(width.toShort); bb.putShort(height.toShort)
      fcc("strf"); bb.putInt(40)
      bb.putInt(40); bb.putInt(width); bb.putInt(height)
      bb.putShort(1); bb.putShort(24)
      fcc("MJPG")
      bb.putInt(width * height * 3)
      bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
      fcc("LIST"); bb.putInt(moviSize); fcc("movi")
      // idx1 offsets are relative to the 'movi' fourcc (the common
      // convention): the first frame chunk header sits at offset 4
      var off = 4
      val offsets = frames.map { f =>
        val o = off; off += 8 + pad(f.length); o
      }
      frames.foreach { f =>
        fcc("00dc"); bb.putInt(f.length); bb.put(f)
        if ((f.length & 1) == 1) bb.put(0.toByte)
      }
      fcc("idx1"); bb.putInt(idx1Size)
      frames.zip(offsets).foreach { case (f, o) =>
        fcc("00dc"); bb.putInt(0x10) // AVIIF_KEYFRAME: every MJPEG frame
        bb.putInt(o); bb.putInt(f.length)
      }
      bb.array()
    }

    /** One constant-gray JPEG frame — the planted-fixture primitive:
      * quality 1.0 round-trips it exactly (see
      * [[ImageIoCodec.encodeJpeg]]), so its decoded mean luma IS `gray`.
      */
    def flatGrayJpeg(w: Int, h: Int, gray: Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (gray << 16) | (gray << 8) | gray
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { im.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      ImageIoCodec.encodeJpeg(im)
    }

    /** [[MediaCodec]] face: the FIRST frame's 8×8 block-luma grid via
      * the image codec — video rides the identical feature /
      * pHash / near-dup machinery as still images.
      */
    val featureDim: Int = ImageIoCodec.featureDim

    def decode(payload: Array[Byte]): Option[Array[Float]] =
      parseAvi(payload).flatMap(p => ImageIoCodec.decode(p.frames.head))
  }

  /** Typed per-item audio statistics — None-valued fields on a payload
    * that does not decode (kept as one row with `decode_ok = false`,
    * never dropped: a corrupt item vanishing silently is how a pipeline
    * loses track of its failure rate).
    */
  final case class AudioFeature(media_id: Long, decode_ok: Boolean,
      n_samples: Option[Long], channels: Option[Long],
      sample_rate: Option[Long], duration_ms: Option[Long],
      peak_abs: Option[Long], zero_crossings: Option[Long],
      sum_sq: Option[Long])

  /** Audio stats extraction as partition-iterator batches — the audio
    * arm of [[extractFeatures]]'s shape: map-only, embarrassingly
    * parallel, never shuffles; corrupt payloads flagged, not dropped.
    */
  def extractAudioStats(media: Dataset[MediaItem]): Dataset[AudioFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      WavCodec.decodeStats(m.payload) match {
        case Some(s) => AudioFeature(m.media_id, decode_ok = true,
          Some(s.nSamples), Some(s.channels.toLong),
          Some(s.sampleRate.toLong), Some(s.durationMs), Some(s.peakAbs),
          Some(s.zeroCrossings), Some(s.sumSq))
        case None => AudioFeature(m.media_id, decode_ok = false,
          None, None, None, None, None, None, None)
      }
    })
  }

  /** Synthetic REAL-audio table: every decodable payload is a valid PCM
    * WAV (encoded by the same `javax.sound.sampled` surface the decoder
    * reads) holding a square wave whose parameters are closed-form in
    * the id — half-period `1 + id % 25` frames, `400 + (id % 50)·8`
    * frames, amplitude `1000 + (id % 30)·1000` — so every statistic
    * [[WavCodec.decodeStats]] emits is analytic: peak = A, sum of
    * squares = N·A² (all samples are ±A), crossings = (N−1) DIV H,
    * duration = N·1000 DIV rate. Ids ≡ 9 (mod 10) carry deterministic
    * junk with no RIFF container — the planted corrupt rows the
    * `decode_ok = false` surface must flag. Generated distributed via
    * spark.range (WAV encoding runs on executors, no driver loop).
    */
  def syntheticAudio(spark: SparkSession, n: Long,
      sampleRate: Int = 8000): Dataset[MediaItem] = {
    import spark.implicits._
    spark.range(n).map { id =>
      if (id % 10 == 9) {
        val rnd = new scala.util.Random(id)
        val junk = new Array[Byte](32)
        rnd.nextBytes(junk)
        MediaItem(id, "audio", "wav", 0, 0, 0L, junk)
      } else {
        val half = 1 + (id % 25).toInt
        val nFrames = 400 + (id % 50).toInt * 8
        val amp = (1000 + (id % 30) * 1000).toShort
        val samples = Array.tabulate(nFrames)(t =>
          if ((t / half) % 2 == 0) amp else (-amp).toShort)
        MediaItem(id, "audio", "wav", 0, 0,
          nFrames.toLong * 1000L / sampleRate,
          WavCodec.encodeWavPcm16(sampleRate, samples))
      }
    }
  }

  /** Typed per-item video statistics — the audio pattern: None-valued
    * fields on a payload that fails [[MjpegCodec]]'s refusal contract,
    * kept as one row with `decode_ok = false`, never dropped.
    */
  final case class VideoFeature(media_id: Long, decode_ok: Boolean,
      n_frames: Option[Long], fps: Option[Long], width: Option[Long],
      height: Option[Long], duration_ms: Option[Long],
      luma_first: Option[Long], luma_sum: Option[Long])

  /** Video stats extraction as partition-iterator batches — map-only,
    * embarrassingly parallel, never shuffles; corrupt payloads flagged,
    * not dropped (the [[extractAudioStats]] shape).
    */
  def extractVideoStats(media: Dataset[MediaItem]): Dataset[VideoFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      MjpegCodec.decodeStats(m.payload) match {
        case Some(s) => VideoFeature(m.media_id, decode_ok = true,
          Some(s.nFrames), Some(s.fps), Some(s.width), Some(s.height),
          Some(s.durationMs), Some(s.lumaFirst), Some(s.lumaSum))
        case None => VideoFeature(m.media_id, decode_ok = false,
          None, None, None, None, None, None, None)
      }
    })
  }

  /** Synthetic REAL-video table: every decodable payload is a valid
    * MJPEG-in-AVI ([[MjpegCodec.encodeAvi]]) of CONSTANT-gray 16×16
    * frames with closed-form parameters — frames = 3 + id % 5, fps =
    * 5 + id % 10, frame f's gray level = (id·37 + f·59) % 256 — and a
    * quality-1.0 JPEG round-trips a flat frame EXACTLY (the pinned
    * [[ImageIoCodec.encodeJpeg]] property), so every
    * [[MjpegCodec.decodeStats]] column is analytic in the id:
    * duration_ms = frames·1000 DIV fps, luma_first = (id·37) % 256,
    * luma_sum = Σ_f (id·37 + f·59) % 256 — the m7 board oracle replays
    * all of it in SQL. Ids ≡ 9 (mod 10) carry RIFF-less junk; ids ≡ 4
    * (mod 10) carry a real AVI with the last 100 bytes CUT — the
    * declared RIFF size then overruns the payload and the decoder must
    * refuse (the truncation face). Generated distributed via
    * spark.range (JPEG + AVI encoding runs on executors).
    */
  def syntheticVideos(spark: SparkSession, n: Long): Dataset[MediaItem] = {
    import spark.implicits._
    spark.range(n).map { id =>
      if (id % 10 == 9) {
        val rnd = new scala.util.Random(id)
        val junk = new Array[Byte](32)
        rnd.nextBytes(junk)
        MediaItem(id, "video", "avi", 0, 0, 0L, junk)
      } else {
        val nFrames = 3 + (id % 5).toInt
        val fps = 5 + (id % 10).toInt
        val frames = (0 until nFrames).map(f =>
          MjpegCodec.flatGrayJpeg(16, 16, ((id * 37 + f * 59) % 256).toInt))
        val avi = MjpegCodec.encodeAvi(16, 16, fps, frames)
        val payload = if (id % 10 == 4)
          java.util.Arrays.copyOf(avi, avi.length - 100) else avi
        MediaItem(id, "video", "avi", 16, 16,
          nFrames.toLong * 1000L / fps, payload)
      }
    }
  }

  /** Synthetic PATTERNED videos for the near-dup face: frame pixels are
    * the [[syntheticImages]] 4×4-block hash pattern with the frame
    * index folded in, JPEG-encoded at quality 1.0 — content-distinct
    * videos whose frame-0 feature grids differ in many pHash bits,
    * while [[perturbVideos]]' one-pixel edit perturbs a single 8×8
    * JPEG block (every other frame byte-identical).
    */
  def syntheticPatternedVideos(spark: SparkSession, n: Long,
      width: Int = 32, height: Int = 32,
      nFrames: Int = 2): Dataset[MediaItem] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val frames = (0 until nFrames).map { f =>
        val im = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            var h2 = id * 0x9E3779B97F4A7C15L +
              (x / 4) * 0xC2B2AE3D27D4EB4FL +
              (y / 4) * 0x165667B19E3779F9L + f * 0xD6E8FEB86659FD93L
            h2 ^= h2 >>> 33; h2 *= 0xFF51AFD7ED558CCDL; h2 ^= h2 >>> 33
            val g = (h2 & 0xFF).toInt
            im.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        ImageIoCodec.encodeJpeg(im)
      }
      MediaItem(id, "video", "avi", width, height, nFrames * 100L,
        MjpegCodec.encodeAvi(width, height, 10, frames))
    }
  }

  /** Planted video near-duplicates: frame 0 re-encoded with pixel
    * (0,0)'s red channel nudged ±16 IN PIXEL SPACE (the m4 edit — a
    * payload-byte flip would corrupt a JPEG entropy stream rather than
    * edit the picture), remaining frames byte-identical, ids offset.
    * Undecodable originals are dropped rather than planted corrupt.
    */
  def perturbVideos(media: Dataset[MediaItem],
      idOffset: Long): Dataset[MediaItem] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      MjpegCodec.parseAvi(m.payload).flatMap { p =>
        val im0 = try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(p.frames.head)))
          catch { case _: java.io.IOException => None }
        im0.map { im =>
          val rgb = im.getRGB(0, 0)
          val r0 = (rgb >> 16) & 0xFF
          val r1 = if (r0 >= 240) r0 - 16 else r0 + 16
          im.setRGB(0, 0, (rgb & 0x00FFFF) | (r1 << 16))
          m.copy(media_id = m.media_id + idOffset,
            payload = MjpegCodec.encodeAvi(p.width, p.height,
              p.rate / p.scale,
              ImageIoCodec.encodeJpeg(im) +: p.frames.tail))
        }
      }
    }
  }

  /** Synthetic media table: deterministic binary payloads + metadata.
    * Payload bytes derive from xxhash64 of the id — distributed generation
    * via spark.range, no driver loop.
    */
  def syntheticMedia(spark: SparkSession, n: Long, kind: String = "image"): Dataset[MediaItem] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val rnd = new scala.util.Random(id)
      val len = 64 + (id % 64).toInt
      val payload = new Array[Byte](len)
      rnd.nextBytes(payload)
      MediaItem(id, kind, if (kind == "image") "jpeg" else "wav",
        width = 32 + (id % 32).toInt, height = 32, duration_ms = 0L, payload)
    }
  }

  /** Feature extraction as partition-iterator batches: one pass per
    * partition, payload decoded by the pluggable codec (all three REAL:
    * [[ImageIoCodec]] for images, [[WavCodec]] for PCM audio,
    * [[MjpegCodec]] for MJPEG video), corrupt payloads flagged rather
    * than dropped. This is the mapInPandas-shaped surface: batch in,
    * batch out, schema fixed, embarrassingly parallel — the operator
    * never shuffles.
    */
  def extractFeatures(media: Dataset[MediaItem],
      codec: MediaCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.map { m =>
        val feat = codec.decode(m.payload)
        MediaFeatures(m.media_id, m.kind,
          if (m.payload == null) 0L else m.payload.length.toLong,
          digest.digest(if (m.payload == null) Array.empty else m.payload)
            .map("%02x".format(_)).mkString,
          feat.getOrElse(Array.empty[Float]),
          feat.isDefined)
      }
    }
  }

  /** Synthetic REAL-image table: every payload is a valid PNG the
    * [[ImageIoCodec]] round-trips. Pixels are 4×4 constant blocks with a
    * deterministic per-(id, block) gray level, aligned with the codec's
    * 8×8 feature grid: each feature cell is (nearly) one flat level, so
    * unrelated images differ in many pHash bits while a one-pixel edit
    * moves one cell by ≤ 16/(255·blockPixels) — the separation the
    * near-dup banding needs. Generated distributed via spark.range
    * (PNG encoding runs on executors, no driver loop); deterministic
    * because PNG is lossless and pixels are a pure function of the id.
    */
  def syntheticImages(spark: SparkSession, n: Long,
      width: Int = 32, height: Int = 32): Dataset[MediaItem] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val payload = ImageIoCodec.encodePng(width, height, (x, y) => {
        var h = id * 0x9E3779B97F4A7C15L + (x / 4) * 0xC2B2AE3D27D4EB4FL +
          (y / 4) * 0x165667B19E3779F9L
        h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
        val g = (h & 0xFF).toInt
        (g << 16) | (g << 8) | g
      })
      MediaItem(id, "image", "png", width, height, 0L, payload)
    }
  }

  /** Real-image resample over the table: decode → bilinear scale →
    * re-encode, metadata updated to the new dimensions; undecodable
    * payloads pass through as null with their original metadata (the
    * decode_ok surface downstream flags them).
    */
  def resizeImages(media: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaItem] = {
    import media.sparkSession.implicits._
    media.map { m =>
      ImageIoCodec.resize(m.payload, w, h) match {
        case Some(p) => m.copy(width = w, height = h, payload = p)
        case None    => m.copy(payload = null)
      }
    }
  }

  /** Planted near-duplicates for REAL images: one pixel nudged in pixel
    * space (see [[ImageIoCodec.perturbPixel]] — a byte-space flip would
    * corrupt the PNG instead of editing it), ids offset. Undecodable
    * originals are dropped rather than planted corrupt.
    */
  def perturbImages(media: Dataset[MediaItem], idOffset: Long): Dataset[MediaItem] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      ImageIoCodec.perturbPixel(m.payload)
        .map(p => m.copy(media_id = m.media_id + idOffset, payload = p))
    }
  }

  final case class MediaFrame(media_id: Long, frame_index: Int, frame: Array[Byte])

  /** REAL frame sampling: demux the AVI and emit every `stride`-th
    * frame's JPEG bytes as its own row — one media row fans out to
    * ⌈frames/stride⌉ frame rows, batch-iterated per partition,
    * order-stable, each frame decodable by [[ImageIoCodec]]. Videos
    * failing the refusal contract fan out to ZERO rows here; the stats
    * face ([[extractVideoStats]]) is where corrupt items surface
    * flagged.
    */
  def sampleVideoFrames(media: Dataset[MediaItem],
      stride: Int = 1): Dataset[MediaFrame] = {
    require(stride >= 1, s"sampleVideoFrames: stride must be >= 1, got $stride")
    import media.sparkSession.implicits._
    media.flatMap { m =>
      MjpegCodec.decodeFrames(m.payload) match {
        case Some(fs) =>
          (0 until fs.size by stride).map(i => MediaFrame(m.media_id, i, fs(i)))
        case None => Nil
      }
    }
  }

  /** 64-bit perceptual hash from a decoded feature vector — the pHash
    * shape: bits record each feature bin against thresholds RELATIVE to
    * the item's own mean (real pHash compares DCT coefficients to their
    * median), so the hash is locality-sensitive — a small payload
    * perturbation moves one bin slightly and flips at most a couple of
    * bits, while unrelated items differ in many. Bit i tests bin
    * (i mod d) against mean·(0.6 + 0.1·(i div d)). Pure built-in
    * higher-order functions; null/empty/zero-mean features → null.
    */
  def perceptualHash(feature: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val d = size(feature)
    val m = aggregate(transform(feature, _.cast("double")), lit(0.0), (a, x) => a + x) / d
    val bits = transform(sequence(lit(0), lit(63)), i => {
      val bin = element_at(feature, pmod(i, d).cast("int") + 1).cast("double")
      val t = m * (lit(0.6) + floor(i / d).cast("double") * lit(0.1))
      when(bin > t, call_function("shiftleft", lit(1L), i.cast("int")))
        .otherwise(lit(0L))
    })
    when(coalesce(d, lit(0)) === 0 || m <= 0,
      lit(null).cast("bigint"))
      .otherwise(aggregate(bits, lit(0L), (a, x) => a.bitwiseOR(x)))
  }

  /** Perceptual near-duplicate pairs over extracted media features:
    * map-only pHash, then the pigeonhole Hamming-band candidate join
    * (Dedup.hammingNearDups) — the image-dedup analog of simhash, with
    * the same 100 TB shape: signature at scan speed, join keyed on
    * narrow chunks.
    */
  def mediaNearDups(features: DataFrame, maxHamming: Int = 6): DataFrame =
    Dedup.hammingNearDups(
      features.filter(col("decode_ok"))
        .select(col("media_id"), perceptualHash(col("feature")).as("phash"))
        .filter(col("phash").isNotNull),
      "media_id", "phash", maxHamming)

  /** Write the media table: binary payload column in parquet, partitioned
    * by kind — large blobs stay out of the dictionary-encoded path and
    * scans that only need metadata never touch payload bytes (columnar
    * projection).
    */
  def writeMedia(media: Dataset[MediaItem], path: String): Unit =
    media.toDF().write.mode("overwrite").partitionBy("kind").parquet(path)

  /** Metadata-only scan: proves payload pruning — the parquet reader
    * never materializes the binary column for this projection.
    */
  def metadataScan(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select("media_id", "kind", "format", "width", "height")
}
