package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video ride through the lake as opaque `binary` columns with typed
  * metadata, and per-item feature extraction runs as partition-iterator
  * batches (the Scala analog of `mapInPandas` batching — one JVM-side
  * iterator per partition, no per-row task overhead).
  *
  * The actual codecs (JPEG decode, audio resample, video frame-grab) are
  * STUBBED: this container ships no image/audio libraries, so
  * `FakeCodec` derives deterministic pseudo-features from the payload
  * bytes. Everything around the stub — schema, batch shape, partitioning,
  * null/corrupt handling — is the real engine surface and is tested; swap
  * `FakeCodec` for a real decoder to productionize.
  */
object Multimodal {

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

  /** ======== STUB ======== deterministic fake decoder. A real build
    * replaces this object (and only this object) with e.g. TwelveMonkeys
    * ImageIO / JavaCV calls. Features are a stable function of the bytes
    * so tests and re-runs are reproducible.
    */
  object FakeCodec {
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
    * partition, payload decoded by the (stubbed) codec, corrupt payloads
    * flagged rather than dropped. This is the mapInPandas-shaped surface:
    * batch in, batch out, schema fixed, embarrassingly parallel — the
    * operator never shuffles.
    */
  def extractFeatures(media: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.map { m =>
        val feat = FakeCodec.decode(m.payload)
        MediaFeatures(m.media_id, m.kind,
          if (m.payload == null) 0L else m.payload.length.toLong,
          digest.digest(if (m.payload == null) Array.empty else m.payload)
            .map("%02x".format(_)).mkString,
          feat.getOrElse(Array.empty[Float]),
          feat.isDefined)
      }
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
