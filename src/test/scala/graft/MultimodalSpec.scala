package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Multimodal plumbing: binary round-trip, partition layout, feature
  * batch shape, corrupt-payload handling, metadata-only pruning.
  */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  test("binary payloads round-trip through partitioned parquet") {
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "mmspec").toString
    val media = Multimodal.syntheticMedia(spark, 20)
    Multimodal.writeMedia(media, s"$root/media")
    val back = spark.read.parquet(s"$root/media").as[Multimodal.MediaItem]
    assert(back.count() == 20)
    val orig = media.collect().map(m => m.media_id -> m.payload.toSeq).toMap
    assert(back.collect().forall(m => orig(m.media_id) == m.payload.toSeq))
    assert(new java.io.File(s"$root/media/kind=image").exists)
  }

  test("feature extraction is deterministic, fixed-dim, and flags corrupt payloads") {
    val media = Multimodal.syntheticMedia(spark, 10)
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.map(_.sha256).sameElements(f2.map(_.sha256)))
    assert(f1.forall(_.feature.length == Multimodal.FakeCodec.featureDim))
    assert(f1.forall(_.decode_ok))

    val corrupt = Seq(Multimodal.MediaItem(99L, "image", "jpeg", 1, 1, 0, Array[Byte](1, 2)))
      .toDS()
    val cf = Multimodal.extractFeatures(corrupt).collect().head
    assert(!cf.decode_ok && cf.feature.isEmpty)
  }

  test("resize updates metadata and payload passes through the stub") {
    val media = Multimodal.syntheticMedia(spark, 5)
    val out = Multimodal.resize(media, 8, 8).collect()
    assert(out.forall(m => m.width == 8 && m.height == 8))
    assert(out.forall(m => m.payload.length <= 64))
  }

  test("frame sampling fans one media row into ordered frame rows") {
    val media = Multimodal.syntheticMedia(spark, 3)
    val frames = Multimodal.frameSample(media, frameBytes = 16, stride = 2).collect()
    val byId = frames.groupBy(_.media_id)
    byId.foreach { case (id, fs) =>
      val payloadLen = media.filter(col("media_id") === id)
        .collect().head.payload.length
      assert(fs.map(_.frame_index).sorted.toSeq ==
        (0 until payloadLen / 16 by 2).toSeq)
      assert(fs.forall(_.frame.length == 16))
    }
  }

  test("perceptual hash separates perturbed copies from unrelated items") {
    val media = Multimodal.syntheticMedia(spark, 120)
    val dups = Multimodal.perturb(media.filter(col("media_id") < 30), 1000L)
    val all = media.union(dups)
    val feats = Multimodal.extractFeatures(all)
    val sigs = feats.select(col("media_id"),
      Multimodal.perceptualHash(col("feature")).as("phash"))
    val ham = sigs.as("a").join(sigs.as("b"),
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("a_id"), col("b.media_id").as("b_id"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("h"))
      .as[(Long, Long, Int)].collect()
    val planted = ham.filter(p => p._2 == p._1 + 1000).map(_._3)
    val unrelated = ham.filterNot(p => p._2 == p._1 + 1000).map(_._3)
    assert(planted.length == 30)
    // a one-byte edit flips at most a few bits (every planted pair stays
    // under the threshold); unrelated items collide only rarely — like
    // any LSH, false positives exist and are verified downstream, so the
    // spec pins the RATE, not an impossible zero
    assert(planted.max <= 5, s"planted max hamming ${planted.max}")
    val fpRate = unrelated.count(_ <= 5).toDouble / unrelated.length
    assert(fpRate < 0.02, s"false-positive rate $fpRate")
  }

  test("mediaNearDups recovers every planted perturbed pair") {
    val media = Multimodal.syntheticMedia(spark, 120)
    val dups = Multimodal.perturb(media.filter(col("media_id") < 30), 1000L)
    val feats = Multimodal.extractFeatures(media.union(dups))
    val pairs = Multimodal.mediaNearDups(feats.toDF(), maxHamming = 5)
      .as[(Long, Long, Int)].collect()
    val plantedFound = pairs.count(p => p._2 == p._1 + 1000)
    assert(plantedFound == 30, s"recovered $plantedFound/30 planted pairs")
  }

  test("metadata-only projection prunes the binary column at the scan") {
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "mmspec").toString
    Multimodal.writeMedia(Multimodal.syntheticMedia(spark, 5), s"$root/media")
    val scan = Multimodal.metadataScan(spark, s"$root/media")
    val plan = scan.queryExecution.executedPlan.toString
    assert(!plan.contains("payload"), s"payload should be pruned from:\n$plan")
    assert(scan.count() == 5)
  }
}
