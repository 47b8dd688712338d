package graft.sources

import java.time.LocalDate

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Age-based partition lifecycle — the engine analog of the reference's
  * S3 lifecycle rules (terraform/modules/s3/main.tf:90-106: raw objects
  * expire at 365 days and transition to a colder storage class at 30).
  * Operates on a date-partitioned parquet root (`date=YYYY-MM-DD/`
  * directories, the layout [[IO.writeCuratedParquet]] produces):
  *
  *  - [[expire]] DROPS partitions whose date is more than `maxAgeDays`
  *    before `asOf` — the 365-day expiry.
  *  - [[compactAged]] REWRITES each partition older than `minAgeDays`
  *    into a single file — the 30-day transition: cold partitions stop
  *    paying the many-small-files tax (listing time, open-per-file
  *    cost), the cluster-side meaning of "cheaper, slower storage".
  *    Fresh partitions keep their write-optimized multi-file layout.
  *
  * Both are ORPHAN-SAFE: only directories named exactly
  * `<partitionCol>=<ISO date>` are candidates. Loose files, `_SUCCESS`/
  * `_metadata`, `__HIVE_DEFAULT_PARTITION__`, malformed values, and
  * other partition columns are never touched — and partitions inside
  * the age window are never rewritten (byte-identity is spec-pinned).
  *
  * All path operations go through the Hadoop `FileSystem` resolved from
  * the root's scheme — the sweep runs unchanged against `file://`,
  * HDFS, or an object store (the deployment where a lifecycle sweep
  * actually matters); a `java.io.File` formulation would be local-only.
  *
  * Scale shape: the driver only LISTS the partition directories (one
  * level, O(number of partitions) — the same listing any partition-
  * pruned read performs); each compaction is a distributed read→write
  * of one partition. `asOf` is explicit, never wall-clock, so a sweep
  * is reproducible and testable.
  */
object Retention {

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  /** Partition directories of `root` older than `olderThanDays` before
    * `asOf`, with their parsed dates; non-conforming entries skipped.
    */
  private def aged(fs: FileSystem, root: String, partitionCol: String,
      olderThanDays: Int, asOf: LocalDate): Seq[(LocalDate, Path)] = {
    val cutoff = asOf.minusDays(olderThanDays.toLong)
    val prefix = s"$partitionCol="
    val rootPath = new Path(root)
    val entries =
      if (fs.exists(rootPath)) fs.listStatus(rootPath).toSeq else Seq.empty
    entries
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .flatMap { st =>
        try Some((LocalDate.parse(st.getPath.getName.stripPrefix(prefix)), st.getPath))
        catch { case _: java.time.format.DateTimeParseException => None }
      }
      .filter { case (d, _) => d.isBefore(cutoff) }
      .sortBy(_._1.toString)
  }

  /** Drop every `partitionCol=<date>` partition more than `maxAgeDays`
    * old as of `asOf`. Returns the dropped partition dates (ISO),
    * ascending.
    */
  def expire(spark: SparkSession, root: String, maxAgeDays: Int, asOf: LocalDate,
      partitionCol: String = "date"): Seq[String] = {
    require(maxAgeDays >= 0, "maxAgeDays must be >= 0")
    val f = fs(spark, root)
    aged(f, root, partitionCol, maxAgeDays, asOf).map { case (d, dir) =>
      f.delete(dir, true)
      d.toString
    }
  }

  /** Rewrite every partition older than `minAgeDays` (as of `asOf`) that
    * holds more than one data file into a single parquet file. Each
    * rewrite lands in a temp directory first and replaces the original
    * files only after the write succeeds, so a failed sweep leaves every
    * partition readable. Returns the compacted partition dates (ISO).
    */
  def compactAged(spark: SparkSession, root: String, minAgeDays: Int,
      asOf: LocalDate, partitionCol: String = "date"): Seq[String] = {
    require(minAgeDays >= 0, "minAgeDays must be >= 0")
    val f = fs(spark, root)
    def dataFiles(dir: Path): Seq[Path] =
      f.listStatus(dir).toSeq
        .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
        .map(_.getPath)
    aged(f, root, partitionCol, minAgeDays, asOf).flatMap { case (d, dir) =>
      val existing = dataFiles(dir)
      if (existing.size <= 1) None // already cold-layout; never rewrite
      else {
        val tmp = new Path(root, s"_compact_tmp_${partitionCol}_$d")
        f.delete(tmp, true)
        // reading the partition DIRECTORY omits the partition column —
        // correct here: the value lives in the directory name, and the
        // rewrite stays inside that directory
        spark.read.parquet(dir.toString).coalesce(1)
          .write.option("compression", "snappy").parquet(tmp.toString)
        val part = dataFiles(tmp) match {
          case Seq(one) => one
          case other => throw new IllegalStateException(
            s"expected one compacted file, got ${other.size} in $tmp")
        }
        // crash-safety ordering: move the compacted file in FIRST (its
        // job-UUID name cannot collide with `existing`), THEN delete the
        // originals — every failure point leaves at least one complete
        // copy of the data inside the partition directory. The transient
        // old+new overlap window is the price; a reader mid-window sees
        // duplicated rows, a crash never strands the only copy in tmp.
        val target = new Path(dir, part.getName)
        if (!f.rename(part, target))
          throw new IllegalStateException(s"could not move $part into $dir")
        existing.foreach(f.delete(_, false))
        f.delete(tmp, true)
        Some(d.toString)
      }
    }
  }
}
