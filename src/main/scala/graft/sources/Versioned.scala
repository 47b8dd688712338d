package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-versioned parquet tables — time travel without a transaction
  * log. Each write lands a complete immutable snapshot under
  * `root/v=<n>/`; a one-line `_LATEST` pointer file is then swapped in
  * by atomic rename, so readers always resolve to a FULLY-written
  * snapshot (the pointer is the commit). Old versions stay readable
  * until [[vacuum]] — a reader that resolved v=N is unaffected by later
  * writes (snapshot isolation by immutability).
  *
  * At 100 TB, pair this with [[Lakehouse.mergeIntoParquet]]-style
  * partition reuse rather than full rewrites; the pointer-swap commit
  * protocol is the same. On object stores without atomic rename, commit
  * via a conditional PUT of the pointer object instead.
  */
object Versioned {

  private def pointer(root: String) = new java.io.File(root, "_LATEST")
  private def versionDir(root: String, v: Long) = s"$root/v=$v"

  /** All snapshot versions present on disk, ascending. */
  def versions(root: String): Seq[Long] = {
    val d = new java.io.File(root)
    if (!d.exists()) Seq.empty
    else d.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toLong).sorted
  }

  /** The committed version (what readers resolve), if any. Distinct from
    * `versions.max`: a crashed write may leave an orphan snapshot dir
    * that was never committed.
    */
  def latest(root: String): Option[Long] = {
    val p = pointer(root)
    if (!p.exists()) None
    else Some(new String(java.nio.file.Files.readAllBytes(p.toPath), "UTF-8").trim.toLong)
  }

  /** Write `df` as the next snapshot and commit it. Returns the new
    * version number.
    */
  def write(df: DataFrame, root: String): Long = {
    val next = versions(root).lastOption.map(_ + 1L).getOrElse(0L)
    df.write.mode("overwrite").parquet(versionDir(root, next))
    // commit = atomic pointer swap; a crash before this line leaves an
    // uncommitted orphan dir that vacuum() removes
    val tmp = new java.io.File(root, s"_LATEST.tmp.$next")
    java.nio.file.Files.write(tmp.toPath, next.toString.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp.toPath, pointer(root).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
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
    removable.foreach { v =>
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(versionDir(root, v)))
    }
    removable
  }
}
