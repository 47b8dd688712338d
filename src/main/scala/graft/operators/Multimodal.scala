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
  *  - [[FakeCodec]] remains for the VIDEO face only: the JDK ships no
  *    video demuxer (and no compressed-audio codecs or resampler), so
  *    video derives deterministic pseudo-features from the payload
  *    bytes. Everything around the stub — schema, batch shape,
  *    partitioning, null/corrupt handling — is the real engine surface
  *    either way.
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

  /** ======== STUB ======== deterministic fake decoder — the remaining
    * stand-in for the VIDEO face only (the JDK genuinely ships no video
    * demuxer; images go through the REAL [[ImageIoCodec]] and PCM audio
    * through the REAL [[WavCodec]] — compressed-audio codecs and
    * resampling would still need an external lib). A production build
    * replaces this object (and only this object) with e.g. JavaCV
    * calls. Features are a stable function of the bytes so tests and
    * re-runs are reproducible.
    */
  object FakeCodec extends MediaCodec {
    val featureDim = 8

    def decode(payload: Array[Byte]): Option[Array[Float]] = {
      if (payload == null || payload.length < 4) return None // "corrupt"
      val out = new Array[Float](featureDim)
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) {
        h = 31 * h + payload(i)
        out(i % featureDim) += (payload(i) & 0xFF) / 255.0f
        i += 1
      }
      var d = 0
      while (d < featureDim) { out(d) = out(d) / math.max(1, payload.length / featureDim); d += 1 }
      Some(out)
    }
  }

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
    * video has no JDK demuxer at all and stays behind [[FakeCodec]].
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
    * partition, payload decoded by the pluggable codec ([[ImageIoCodec]]
    * for real image bytes, [[FakeCodec]] for the stub faces), corrupt
    * payloads flagged rather than dropped. This is the mapInPandas-shaped
    * surface: batch in, batch out, schema fixed, embarrassingly parallel
    * — the operator never shuffles.
    */
  def extractFeatures(media: Dataset[MediaItem],
      codec: MediaCodec = FakeCodec): Dataset[MediaFeatures] = {
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

  /** Resize (STUB codec): metadata transform is real — width/height are
    * recomputed and the payload passes through the fake resampler.
    */
  def resize(media: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaItem] = {
    import media.sparkSession.implicits._
    media.map(m => m.copy(width = w, height = h,
      payload = if (m.payload == null) null
        else java.util.Arrays.copyOf(m.payload, math.min(m.payload.length, w * h))))
  }

  final case class MediaFrame(media_id: Long, frame_index: Int, frame: Array[Byte])

  /** Frame sampling (STUB codec): every `stride`-th fixed-size chunk of
    * the payload stands in for a decoded video frame. The real surface —
    * one media row fanning out to N frame rows, batch-iterated per
    * partition, order-stable — is exactly what a JavaCV-backed version
    * would keep.
    */
  def frameSample(media: Dataset[MediaItem], frameBytes: Int = 16,
      stride: Int = 2): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val p = if (m.payload == null) Array.empty[Byte] else m.payload
      val nFrames = p.length / frameBytes
      (0 until nFrames by stride).map { i =>
        MediaFrame(m.media_id, i,
          java.util.Arrays.copyOfRange(p, i * frameBytes, (i + 1) * frameBytes))
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

  /** Deterministically perturbed copies (one payload byte materially
    * changed — a visible single-pixel edit, not a bit of noise) with
    * offset ids — planted near-duplicates for dedup verification.
    */
  def perturb(media: Dataset[MediaItem], idOffset: Long): Dataset[MediaItem] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val p = if (m.payload == null) null else m.payload.clone()
      if (p != null && p.nonEmpty) p(0) = (p(0) ^ 0x55).toByte
      m.copy(media_id = m.media_id + idOffset, payload = p)
    }
  }

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
