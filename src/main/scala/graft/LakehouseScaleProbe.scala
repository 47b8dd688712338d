package graft

import graft.sources.{IO, Lakehouse, Layout, SkipIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the lakehouse layer: 50M-row table (4 orders of
  * magnitude above the sf0.01 gate), exercising the three claims that
  * must hold at 100 TB shape:
  *   - skip-index build touches footers only (seconds, not a scan);
  *   - an index-pruned scan reads a small fraction of files and beats
  *     the full scan+filter;
  *   - z-order pruning works on BOTH dimensions; copy-on-write merge
  *     cost tracks the change set's partitions, not the table.
  * Run: sbt "runMain graft.LakehouseScaleProbe 50000000"
  */
object LakehouseScaleProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(50000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[lake-probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // synthetic fact table: uniform x/y dims, 32 date partitions
    val df = spark.range(rows).select(
      col("id"),
      pmod(xxhash64(col("id")), lit(100000L)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(100000L)).as("y"),
      concat(lit("d"), pmod(col("id"), lit(32))).as("date"),
      (pmod(xxhash64(col("id"), lit(2)), lit(1000000L)) / 1000.0).as("v"))

    val zPath = "target/lakeprobe/z"
    timed(s"z-order write ($rows rows, 64 files)")(
      Layout.zorderWrite(df, zPath, Seq("x", "y"), numFiles = 64))
    val idx = timed("skip-index build (footers only)")(
      SkipIndex.build(spark, zPath, Seq("x", "y")).persist())
    println(s"[lake-probe]   files indexed: ${idx.count()}")

    val (zs, zRead, zTotal) = SkipIndex.rangeScan(spark, zPath, idx, "x", 10000L, 12000L)
    timed(s"pruned x-scan ($zRead of $zTotal files)")(println(zs.count()))
    val (ys, yRead, _) = SkipIndex.rangeScan(spark, zPath, idx, "y", 10000L, 12000L)
    timed(s"pruned y-scan ($yRead of $zTotal files)")(println(ys.count()))
    timed("full scan + filter (no pruning)")(println(
      spark.read.parquet(zPath).filter(col("x") >= 10000L && col("x") <= 12000L).count()))

    // copy-on-write merge: change set touching 2 of 32 partitions
    val tPath = "target/lakeprobe/t"
    timed("partitioned write (32 date partitions)")(
      IO.writeCuratedParquet(df, tPath, Seq("date")))
    val changes = spark.range(1000).select(
      (col("id") * 32).as("id"), // all land in date=d0
      lit(-1L).as("x"), lit(-1L).as("y"), lit("d0").as("date"), lit(0.0).as("v"))
      .union(spark.range(100).select((col("id") * 32 + 1).as("id"),
        lit(-1L).as("x"), lit(-1L).as("y"), lit("d1").as("date"), lit(0.0).as("v")))
    val stats = timed("copy-on-write merge (2 of 32 partitions)")(
      Lakehouse.mergeIntoParquet(spark, tPath, changes, Seq("id"), "date"))
    println(s"[lake-probe]   rewritten: ${stats.rewrittenPartitions.mkString(",")} rows=${stats.touchedRows}")
    timed("verify merged row count")(println(spark.read.parquet(tPath).count()))
    spark.stop()
  }
}
