package graft

import graft.sources.{IO, Lakehouse, Layout, SkipIndex}
import org.apache.spark.sql.functions._

/** Lakehouse-layer features: keyed upsert/delete/merge, copy-on-write
  * partition-scoped merge, footer-stats skipping index, and Z-order
  * layout.
  */
class LakehouseSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(name: String) = s"target/test-lakehouse/$name"

  test("upsert replaces matched keys and appends new ones") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "tag", "v")
    val source = Seq((2L, "B", 99.0), (4L, "d", 40.0)).toDF("id", "tag", "v")
    val got = Lakehouse.upsert(target, source, Seq("id"))
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("delete drops exactly the tombstoned keys") {
    val target = (1L to 6L).map(i => (i, i * 1.5)).toDF("id", "v")
    val got = Lakehouse.delete(target, Seq(2L, 5L, 99L).toDF("id"), Seq("id"))
      .orderBy("id").as[(Long, Double)].collect().map(_._1).toSeq
    assert(got == Seq(1L, 3L, 4L, 6L))
  }

  test("mergeUpdate updates only mapped columns, keeps the rest, inserts nothing extra") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "tag", "v")
    val source = Seq((2L, 5.0)).toDF("id", "delta")
    val got = Lakehouse.mergeUpdate(target, source, Seq("id"),
      Map("v" -> (col("v") + col("src_delta"))))
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "b", 25.0)))
  }

  test("mergeIntoParquet rewrites only the change set's partitions") {
    val path = tmp("cow")
    val base = (0L until 300L).map(i => (i, s"d${i % 3}", i.toDouble))
      .toDF("id", "date", "v")
    IO.writeCuratedParquet(base, path, Seq("date"))
    // capture the untouched partition's file set before the merge
    def d2Files: Set[String] = new java.io.File(s"$path/date=d2")
      .listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    val filesBefore = d2Files
    val changes = Seq((1L, "d0", -1.0), (9000L, "d1", 42.0)).toDF("id", "date", "v")
    val stats = Lakehouse.mergeIntoParquet(spark, path, changes, Seq("id"), "date")
    assert(stats.rewrittenPartitions == Seq("d0", "d1"))
    val after = spark.read.parquet(path)
    assert(after.count() == 301)
    assert(after.filter(col("id") === 1L).select("v").as[Double].head() == -1.0)
    assert(after.filter(col("id") === 9000L).count() == 1)
    // d2 files untouched (same names ⇒ never rewritten; writes get fresh UUIDs)
    assert(d2Files == filesBefore)
  }

  test("skip index: rangeScan equals full filter and prunes files") {
    val path = tmp("skip")
    val df = (0L until 20000L).map(i => (i, (i % 7).toString, i.toDouble / 3))
      .toDF("id", "k", "v")
    // range-layout on id ⇒ tight per-file id envelopes
    Layout.linearWrite(df, path, "id", numFiles = 16)
    val idx = SkipIndex.build(spark, path, Seq("id", "v"))
    assert(idx.count() == 16)
    val (scan, read, total) = SkipIndex.rangeScan(spark, path, idx, "id", 5000L, 6000L)
    val expected = spark.read.parquet(path)
      .filter(col("id") >= 5000L && col("id") <= 6000L)
    assert(scan.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      expected.orderBy("id").as[(Long, String, Double)].collect().toSeq)
    assert(total == 16 && read <= 3, s"expected <=3 of 16 files, read $read")
  }

  test("skip index: string column stats and empty-result scan") {
    val path = tmp("skipstr")
    val df = (0 until 1000).map(i => (i.toLong, f"key$i%04d")).toDF("id", "k")
    Layout.linearWrite(df, path, "k", numFiles = 8)
    val idx = SkipIndex.build(spark, path, Seq("k"))
    val (scan, read, total) = SkipIndex.rangeScan(spark, path, idx, "k", "key0100", "key0199")
    assert(scan.count() == 100 && read < total)
    val (empty, readNone, _) = SkipIndex.rangeScan(spark, path, idx, "k", "zzz", "zzzz")
    assert(empty.count() == 0 && readNone == 0)
  }

  test("bloom index: point scan equals full filter, prunes interleaved files") {
    val path = tmp("bloomidx")
    // Hash-interleaved ids: every file's [min,max] envelope spans nearly
    // the whole domain, so min/max pruning is USELESS here — the case the
    // bloom index exists for.
    val df = (0L until 20000L).map(i => (i * 2654435761L % 20011L, i))
      .toDF("id", "payload")
    df.repartition(16).write.mode("overwrite").parquet(path)
    val minmax = SkipIndex.build(spark, path, Seq("id"))
    val bloom = SkipIndex.buildBloom(spark, path, "id", expectedPerFile = 5000L)
    assert(bloom.count() == minmax.count())
    val probe = 12345L * 2654435761L % 20011L // a value that exists
    assert(SkipIndex.candidateFiles(minmax, "id", probe, probe).size ==
      minmax.count().toInt) // envelopes keep everything
    val (scan, read, total) = SkipIndex.pointScan(spark, path, bloom, "id", probe)
    val expected = spark.read.parquet(path).filter(col("id") === probe)
    assert(scan.orderBy("payload").as[(Long, Long)].collect().toSeq ==
      expected.orderBy("payload").as[(Long, Long)].collect().toSeq)
    assert(read < total, s"bloom pruned nothing: $read of $total")
    // no false negatives on a sample of existing keys
    val keys = spark.read.parquet(path).select("id").as[Long].take(50)
    keys.foreach { k =>
      val (s2, _, _) = SkipIndex.pointScan(spark, path, bloom, "id", k)
      assert(s2.count() == spark.read.parquet(path).filter(col("id") === k).count())
    }
    // absent key: result empty regardless of how many files survive the probe
    val (missing, _, _) = SkipIndex.pointScan(spark, path, bloom, "id", 999999L)
    assert(missing.count() == 0)
  }

  test("parquet-native bloom filters land in footers, only for listed columns") {
    import scala.jdk.CollectionConverters._
    val path = tmp("pqbloom")
    // ids hash-interleaved across the payload sort order: min/max stats
    // can't prune an id point lookup, which is what the bloom is for
    val df = (0L until 20000L).map(i => (i * 2654435761L % 20011L, i))
      .toDF("id", "payload")
    Layout.linearWrite(df, path, "payload", numFiles = 4, bloomCols = Seq("id"))
    val conf = spark.sessionState.newHadoopConf()
    val files = new java.io.File(path).listFiles.toSeq
      .filter(_.getName.endsWith(".parquet"))
    assert(files.size == 4)
    files.foreach { f =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
      try {
        val byName = r.getFooter.getBlocks.get(0).getColumns.asScala
          .map(c => c.getPath.toDotString -> c).toMap
        assert(byName("id").getBloomFilterOffset >= 0,
          s"${f.getName}: id must carry a bloom filter")
        assert(byName("payload").getBloomFilterOffset < 0,
          s"${f.getName}: unlisted payload must not pay footer bytes")
      } finally r.close()
    }
    // the filter is a pruning aid, never a semantics change
    val probe = 12345L * 2654435761L % 20011L
    val got = spark.read.parquet(path).filter(col("id") === probe)
      .select("payload").as[Long].collect().toSet
    val want = df.filter(col("id") === probe)
      .select("payload").as[Long].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("z-order prunes on BOTH dimensions where linear layout prunes on one") {
    val rnd = new scala.util.Random(5)
    val df = Seq.fill(20000)((rnd.nextInt(10000).toLong, rnd.nextInt(10000).toLong))
      .toDF("x", "y")
    val zPath = tmp("zorder")
    val lPath = tmp("linear")
    Layout.zorderWrite(df, zPath, Seq("x", "y"), numFiles = 16)
    Layout.linearWrite(df, lPath, "x", numFiles = 16)
    val zIdx = SkipIndex.build(spark, zPath, Seq("x", "y"))
    val lIdx = SkipIndex.build(spark, lPath, Seq("x", "y"))
    // narrow y-range query: x-sorted layout keeps ~every file
    val zKeepY = SkipIndex.candidateFiles(zIdx, "y", 1000L, 1500L).size
    val lKeepY = SkipIndex.candidateFiles(lIdx, "y", 1000L, 1500L).size
    assert(zKeepY < lKeepY, s"zorder $zKeepY vs linear $lKeepY files for y-range")
    assert(lKeepY == 16) // linear layout cannot skip on y at all
    // and the z layout still skips on x too
    val zKeepX = SkipIndex.candidateFiles(zIdx, "x", 1000L, 1500L).size
    assert(zKeepX < 16, s"zorder kept $zKeepX files for x-range")
    // layout changes bytes, never rows
    assert(spark.read.parquet(zPath).count() == 20000)
  }

  test("quantile_bucket: binary search matches linear count, null and NaN handled") {
    import graft.functions.QuantileBucket
    val bounds = Array(1.0, 3.0, 3.0, 7.5) // duplicates tolerated
    val vals = Seq[java.lang.Double](0.0, 1.0, 2.0, 3.0, 5.0, 7.5, 100.0,
      null, Double.NaN)
    val got = vals.toDF("v")
      .select(QuantileBucket.bucket(col("v"), bounds.distinct.sorted).as("b"))
      .as[Option[Int]].collect().toSeq
    // linear reference: #bounds strictly below v (distinct bounds: 1,3,7.5)
    val distinctB = bounds.distinct.sorted
    def ref(v: Double) = distinctB.count(b => java.lang.Double.compare(b, v) < 0)
    assert(got == Seq(Some(ref(0)), Some(ref(1)), Some(ref(2)), Some(ref(3)),
      Some(ref(5)), Some(ref(7.5)), Some(ref(100)), None, Some(3)))
  }

  test("saltedJoin == plain join for inner/left/semi/anti; rejects dim-preserving types") {
    import graft.operators.Skew
    val fact = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "zz")).toDF("id", "k")
    val dim = Seq(("a", 10.0), ("b", 20.0), ("c", 30.0)).toDF("k", "v")
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val plain = fact.join(dim, Seq("k"), jt).columns.toSeq
      val saltedDf = Skew.saltedJoin(fact, dim, "k", col("id"), salts = 4, joinType = jt)
      val expected = fact.join(dim, Seq("k"), jt)
        .select(plain.map(col): _*).orderBy("id").collect().toSeq
      val got = saltedDf.select(plain.map(col): _*).orderBy("id").collect().toSeq
      assert(got == expected, s"joinType=$jt diverged")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, "k", col("id"), joinType = "full_outer")
    }
  }

  test("additive schema evolution: old files null-extend; retypes rejected") {
    val path = tmp("evolve")
    // append-mode writes accumulate across JVM runs — start clean
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    Lakehouse.appendEvolved(spark, path, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    // additive append: new column `score`
    Lakehouse.appendEvolved(spark, path,
      Seq((3L, "c", 0.5)).toDF("id", "s", "score"))
    val got = Lakehouse.readEvolved(spark, path)
      .select("id", "s", "score").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(got == Seq((1L, "a", None), (2L, "b", None), (3L, "c", Some(0.5))))
    // a plain single-footer read is exactly the trap readEvolved avoids:
    // it may or may not see `score` depending on which footer wins
    assert(Lakehouse.readEvolved(spark, path).schema.fieldNames.contains("score"))
    // retype rejected
    intercept[IllegalArgumentException] {
      Lakehouse.appendEvolved(spark, path, Seq((9L, 7L, 0.1)).toDF("id", "s", "score"))
    }
  }

  test("retention: age-based expiry + aged compaction, orphan-safe, untouched bytes identical") {
    import graft.sources.Retention
    import java.time.LocalDate
    val path = tmp("retention")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    // three date partitions, multi-file each (4 writer tasks per date)
    val rows = (0L until 300L).map(i =>
      (i, Seq("2026-01-01", "2026-07-20", "2026-08-10")(((i % 3)).toInt), i.toDouble))
      .toDF("id", "date", "v").repartition(4)
    rows.write.partitionBy("date").parquet(path)
    // orphans the sweep must never touch: a loose file, a non-date dir,
    // a default partition, a malformed date
    val loose = new java.io.File(path, "notes.txt")
    java.nio.file.Files.write(loose.toPath, "keep me".getBytes)
    new java.io.File(path, "region=EU").mkdirs()
    new java.io.File(path, "date=__HIVE_DEFAULT_PARTITION__").mkdirs()
    new java.io.File(path, "date=not-a-date").mkdirs()
    def files(p: String): Map[String, Long] =
      Option(new java.io.File(s"$path/$p").listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .map(f => f.getName -> f.length()).toMap
    assert(files("date=2026-07-20").size > 1, "precondition: multi-file partition")
    val freshBefore = files("date=2026-08-10")
    val freshBytes = new java.io.File(s"$path/date=2026-08-10").listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .map(f => java.nio.file.Files.readAllBytes(f.toPath).toSeq).toSeq

    val asOf = LocalDate.parse("2026-08-13")
    // expiry (the 365d lifecycle rule, here 180d): only 2026-01-01 is past it
    assert(Retention.expire(spark, path, maxAgeDays = 180, asOf = asOf) == Seq("2026-01-01"))
    assert(!new java.io.File(s"$path/date=2026-01-01").exists())
    // transition (the 30d rule, here 7d): 2026-07-20 compacts to ONE file,
    // 2026-08-10 (3 days old) keeps its layout
    assert(Retention.compactAged(spark, path, minAgeDays = 7, asOf = asOf)
      == Seq("2026-07-20"))
    assert(files("date=2026-07-20").size == 1, "aged partition must be one file")
    // second sweep is a no-op (already compacted — never rewrite again)
    assert(Retention.compactAged(spark, path, minAgeDays = 7, asOf = asOf).isEmpty)
    // untouched partition: same file names, sizes, and BYTES
    assert(files("date=2026-08-10") == freshBefore)
    val freshAfter = new java.io.File(s"$path/date=2026-08-10").listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .map(f => java.nio.file.Files.readAllBytes(f.toPath).toSeq).toSeq
    assert(freshAfter == freshBytes, "untouched partition must be byte-identical")
    // orphans intact; data readable and correct after the sweep
    assert(loose.exists() && new java.io.File(path, "region=EU").exists()
      && new java.io.File(path, "date=not-a-date").exists())
    val back = spark.read.parquet(path)
    assert(back.count() == 200, "expired partition gone, others complete")
    assert(back.filter(col("date") === "2026-07-20").agg(sum("v")).as[Double].head()
      == rows.filter(col("date") === "2026-07-20").agg(sum("v")).as[Double].head(),
      "compaction must preserve every row")
  }

  test("versioned snapshots: time travel, pointer commit, vacuum keeps committed") {
    import graft.sources.Versioned
    val root = tmp("versioned")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))

    val v0 = Versioned.write(Seq((1L, "a")).toDF("id", "s"), root)
    val v1 = Versioned.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), root)
    assert((v0, v1) == (0L, 1L))
    assert(Versioned.latest(root).contains(1L))
    assert(Versioned.readLatest(spark, root).count() == 2)
    // time travel to the first snapshot
    assert(Versioned.read(spark, root, 0L).count() == 1)

    // an uncommitted orphan above the pointer (simulated crash mid-write)
    Seq((9L, "x")).toDF("id", "s").write.parquet(s"$root/v=2")
    assert(Versioned.latest(root).contains(1L)) // readers unaffected

    val removed = Versioned.vacuum(root, keepLast = 1)
    assert(removed == Seq(0L))
    assert(Versioned.readLatest(spark, root).count() == 2) // committed intact
    assert(Versioned.versions(root) == Seq(1L, 2L)) // orphan not vacuumed
  }

  test("snapshot diff classifies inserts, deletes, updates; drops unchanged") {
    import graft.sources.Versioned
    val root = tmp("versioned_diff")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    Versioned.write(Seq(
      (1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0), (4L, null, 4.0))
      .toDF("id", "s", "v"), root)
    Versioned.write(Seq(
      (1L, "a", 1.0),        // unchanged -> dropped
      (2L, "b", 20.0),       // update (value)
      (4L, "now-set", 4.0),  // update (null -> value, null-safe compare)
      (5L, "e", 5.0))        // insert; 3 deleted
      .toDF("id", "s", "v"), root)
    val got = Versioned.diff(spark, root, 0L, 1L, Seq("id"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "update", 3L -> "delete", 4L -> "update", 5L -> "insert"))
  }

  test("csv round-trip preserves rows, types, and embedded delimiters") {
    val path = tmp("csv")
    val df = Seq((1L, "plain", 1.5), (2L, "comma, quoted", -0.25), (3L, "\"q\"", 0.0))
      .toDF("id", "s", "v")
    IO.writeCsv(df, path)
    val got = IO.readCsv(spark, df.schema, path)
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "plain", 1.5), (2L, "comma, quoted", -0.25), (3L, "\"q\"", 0.0)))
  }
}
