package graft

import java.time.LocalDate

import graft.sources.{IO, Lakehouse, Layout, Retention, SkipIndex, Versioned}
import org.apache.hadoop.fs.RawLocalFileSystem
import org.apache.spark.sql.functions._

/** A second FileSystem scheme for the spec matrix: local storage exposed
  * under `probe://` through a DIFFERENT FileSystem implementation than
  * the default `file://` (RawLocalFileSystem vs the checksummed
  * LocalFileSystem) with a non-file scheme in every Path. Any code that
  * slipped back to `java.io.File` or hard-coded `file:` would break on
  * these URIs while passing every file:// spec.
  */
class ProbeFileSystem extends RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("probe:///")
  override def getScheme: String = "probe"
}

/** The object-store seam, proven: Retention / Versioned / Lakehouse /
  * Layout+SkipIndex route all path operations through the Hadoop
  * `FileSystem` resolved from the root URI, so the same calls must work
  * verbatim over a second scheme. (Every other spec runs on `file://`
  * only — this matrix is what catches a local-FS assumption leaking in;
  * it DID catch Versioned's original `java.io.File` formulation.)
  */
class FsSchemeSpec extends SparkSpec {

  import spark.implicits._

  private lazy val probeRoot: String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.probe.impl", classOf[ProbeFileSystem].getName)
    val dir = new java.io.File("target/fs_scheme").getAbsoluteFile
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    s"probe://$dir"
  }

  test("versioned snapshots work verbatim over a second FS scheme") {
    val root = s"$probeRoot/versioned"
    val v0 = Versioned.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root)
    val v1 = Versioned.write(Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "v"), root)
    assert((v0, v1) == (0L, 1L))
    assert(Versioned.versions(root) == Seq(0L, 1L))
    assert(Versioned.latest(root).contains(1L))
    assert(Versioned.readLatest(spark, root).count() == 3)
    assert(Versioned.read(spark, root, 0L).count() == 2) // time travel
    val d = Versioned.diff(spark, root, 0L, 1L, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(d == Set((2L, "update"), (3L, "insert")))
    assert(Versioned.vacuum(root, keepLast = 1) == Seq(0L))
    assert(Versioned.versions(root) == Seq(1L))
    assert(Versioned.readLatest(spark, root).count() == 3)
  }

  test("retention expire + aged compaction work verbatim over a second FS scheme") {
    val root = s"$probeRoot/retention"
    val df = Seq(
      (1L, "2026-01-01"), (2L, "2026-08-01"), (3L, "2026-08-01"), (4L, "2026-08-10")
    ).toDF("id", "date")
    // two files in the aged partition so compaction has work to do
    df.repartition(2).write.partitionBy("date").parquet(root)
    val asOf = LocalDate.parse("2026-08-12")
    assert(Retention.expire(spark, root, maxAgeDays = 180, asOf = asOf) == Seq("2026-01-01"))
    assert(Retention.compactAged(spark, root, minAgeDays = 7, asOf = asOf) == Seq("2026-08-01"))
    val back = spark.read.parquet(root)
    assert(back.count() == 3, "expired partition gone, others complete")
    assert(back.filter(col("date") === "2026-08-01").count() == 2)
  }

  test("copy-on-write merge works verbatim over a second FS scheme") {
    val root = s"$probeRoot/merge"
    val base = Seq((1L, 10.0, "d0"), (2L, 20.0, "d0"), (3L, 30.0, "d1"), (4L, 40.0, "d2"))
      .toDF("id", "v", "date")
    IO.writeCuratedParquet(base, root, Seq("date"))
    val changes = Seq((2L, 99.0, "d0"), (5L, 50.0, "d1")).toDF("id", "v", "date")
    val stats = Lakehouse.mergeIntoParquet(spark, root, changes, Seq("id"), "date")
    assert(stats.rewrittenPartitions.toSet == Set("d0", "d1"))
    val out = spark.read.parquet(root)
    assert(out.count() == 5)
    assert(out.filter(col("id") === 2L).head().getDouble(1) == 99.0)
    assert(out.filter(col("date") === "d2").count() == 1, "untouched partition intact")
  }

  test("z-order write + skip-index pruning work verbatim over a second FS scheme") {
    val root = s"$probeRoot/zorder"
    val df = spark.range(10000).select(
      col("id"),
      pmod(xxhash64(col("id")), lit(1000L)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(1000L)).as("y"))
    Layout.zorderWrite(df, root, Seq("x", "y"), numFiles = 8)
    val idx = SkipIndex.build(spark, root, Seq("x", "y"))
    assert(idx.count() == 8L)
    val (scan, read, total) = SkipIndex.rangeScan(spark, root, idx, "x", 100L, 150L)
    val full = spark.read.parquet(root)
      .filter(col("x") >= 100L && col("x") <= 150L).count()
    assert(scan.count() == full, "pruned scan must equal full scan+filter")
    assert(read < total, s"must prune ($read of $total files read)")
  }
}
