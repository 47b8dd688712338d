package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-versioned parquet tables — time travel without a transaction
  * log. Each write lands a complete immutable snapshot under
  * `root/v=<n>/`; a one-line `_LATEST` pointer file is then swapped in
  * by rename, so readers always resolve to a FULLY-written snapshot
  * (the pointer is the commit). Old versions stay readable until
  * [[vacuum]] — a reader that resolved v=N is unaffected by later
  * writes (snapshot isolation by immutability).
  *
  * Every path operation goes through the Hadoop `FileSystem` resolved
  * from the root URI (a `java.io.File` formulation would be local-only
  * — this must run against HDFS/object-store roots on a real cluster;
  * FsSchemeSpec drives it over a second scheme to prove no local-FS
  * assumption leaks back in). Commit atomicity is the filesystem's
  * rename: atomic overwrite on POSIX-rename stores (local, HDFS via the
  * delete+rename fallback below with a one-commit-wide reader window);
  * on object stores without atomic rename, commit via a conditional PUT
  * of the pointer object instead.
  *
  * At 100 TB, pair this with [[Lakehouse.mergeIntoParquet]]-style
  * partition reuse rather than full rewrites; the pointer-swap commit
  * protocol is the same.
  */
object Versioned {

  private def pointer(root: String) = new Path(root, "_LATEST")
  private def versionDir(root: String, v: Long) = s"$root/v=$v"

  /** Hadoop conf for the String-rooted read-side APIs: the active
    * session's (so per-session `fs.*` settings are honored), else a
    * default Configuration.
    */
  private def hconf: org.apache.hadoop.conf.Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  private def fsFor(root: String): FileSystem = new Path(root).getFileSystem(hconf)

  /** All snapshot versions present on disk, ascending. */
  def versions(root: String): Seq[Long] = {
    val fs = fsFor(root)
    val d = new Path(root)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong).sorted
  }

  /** The committed version (what readers resolve), if any. Distinct from
    * `versions.max`: a crashed write may leave an orphan snapshot dir
    * that was never committed.
    */
  def latest(root: String): Option[Long] = {
    val fs = fsFor(root)
    val p = pointer(root)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong)
      finally in.close()
    }
  }

  /** Write `df` as the next snapshot and commit it. Returns the new
    * version number.
    */
  def write(df: DataFrame, root: String): Long = {
    val next = versions(root).lastOption.map(_ + 1L).getOrElse(0L)
    df.write.mode("overwrite").parquet(versionDir(root, next))
    // commit = pointer swap; a crash before this line leaves an
    // uncommitted orphan dir that vacuum() removes. Plain rename
    // overwrites atomically on POSIX-backed stores; filesystems with
    // no-overwrite rename semantics take the delete+rename fallback
    // (readers in that window see the previous pointer missing and
    // should retry — or commit via conditional PUT, see scaladoc).
    val fs = fsFor(root)
    val ptr = pointer(root)
    val tmp = new Path(root, s"_LATEST.tmp.$next")
    val out = fs.create(tmp, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, ptr)) {
      fs.delete(ptr, false)
      if (!fs.rename(tmp, ptr))
        throw new java.io.IOException(s"could not commit pointer $ptr")
    }
    next
  }

  /** Read the committed snapshot. */
  def readLatest(spark: SparkSession, root: String): DataFrame = {
    val v = latest(root).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $root"))
    read(spark, root, v)
  }

  /** Time travel: read a specific snapshot. */
  def read(spark: SparkSession, root: String, version: Long): DataFrame =
    spark.read.parquet(versionDir(root, version))

  /** Snapshot diff — CDC between two versions without a transaction log:
    * key-joined comparison classifying every key as insert (only in
    * `toV`), delete (only in `fromV`), or update (present in both with
    * any non-key column differing, null-safely). Unchanged keys are
    * dropped. Output: key columns + `change_type`.
    *
    * Scale shape: ONE co-keyed full outer join (both snapshots shuffle
    * on the key — unavoidable without a log; bucket both snapshots on
    * the key at write time and even that shuffle disappears). The
    * column compare is a null-safe conjunction evaluated in codegen, no
    * UDF. This is how downstream consumers incrementally follow a table
    * that is republished wholesale — the reference's hourly full
    * overwrite (scripts/glue_transform/transform.py:179-185) is exactly
    * such a publisher.
    */
  def diff(spark: SparkSession, root: String, fromV: Long, toV: Long,
      keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val a = read(spark, root, fromV)
    val nonKeys = a.columns.toSeq.filterNot(keyCols.contains)
    val aSide = a.select(
      keyCols.map(col) ++ Seq(lit(true).as("__in_a")) ++
        nonKeys.map(c => col(c).as(s"__a_$c")): _*)
    val bSide = read(spark, root, toV).select(
      keyCols.map(col) ++ Seq(lit(true).as("__in_b")) ++
        nonKeys.map(c => col(c).as(s"__b_$c")): _*)
    val changed = nonKeys
      .map(c => !(col(s"__a_$c") <=> col(s"__b_$c")))
      .foldLeft(lit(false))(_ || _)
    aSide.join(bSide, keyCols, "full_outer")
      .withColumn("change_type",
        when(col("__in_a").isNull, "insert")
          .when(col("__in_b").isNull, "delete")
          .when(changed, "update"))
      .filter(col("change_type").isNotNull)
      .select(keyCols.map(col) :+ col("change_type"): _*)
  }

  /** Drop all snapshots except the `keepLast` most recent committed-or-
    * older ones, plus any uncommitted orphan NEWER than the pointer
    * (a concurrent in-flight write must not be vacuumed). Never removes
    * the committed version. Returns the versions deleted.
    */
  def vacuum(root: String, keepLast: Int = 1): Seq[Long] = {
    require(keepLast >= 1, "must keep at least the committed snapshot")
    val committed = latest(root).getOrElse(return Seq.empty)
    val removable = versions(root)
      .filter(_ <= committed)   // orphans above the pointer are in-flight
      .sorted.dropRight(keepLast)
    val fs = fsFor(root)
    removable.foreach(v => fs.delete(new Path(versionDir(root, v)), true))
    removable
  }
}
