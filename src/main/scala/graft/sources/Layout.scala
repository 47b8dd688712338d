package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional clustering (Z-order) for Parquet layouts.
  *
  * A range-partitioned-by-one-column layout gives [[SkipIndex]] perfect
  * pruning on that column and none on any other. Writing files along a
  * Z-order curve over several columns gives every indexed column an
  * envelope ~√-of-linear wide (2-d), so file skipping bites on ALL of
  * them — the layout trade every table format's OPTIMIZE ZORDER makes.
  *
  * Cost shape at 100 TB: one `approxQuantile` pass to learn per-column
  * bucket boundaries (driver holds `bits`-per-column doubles, nothing
  * more), then one range-partitioning shuffle on the interleaved key —
  * the same two passes a plain global sort costs.
  */
object Layout {

  /** Z-value: rank-bucket each column into `bitsPerCol` bits via learned
    * quantile boundaries, then interleave the bits. Buckets (not raw
    * bits) make the curve robust to arbitrary value distributions; nulls
    * land in bucket 0.
    */
  def zvalue(df: DataFrame, cols: Seq[String], bitsPerCol: Int = 8): Column = {
    require(cols.size >= 2, "z-order needs at least two columns")
    require(bitsPerCol >= 1 && bitsPerCol <= 16, "bitsPerCol must be in [1,16]")
    val nBuckets = 1 << bitsPerCol
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    // ONE stats pass learns every column's boundaries together
    val allBounds = df.stat.approxQuantile(cols.toArray, probs, 0.001)
    val buckets: Seq[Column] = cols.zip(allBounds).map { case (c, raw) =>
      val bounds = raw.distinct.sorted
      // bucket = #boundaries strictly below the value — binary search
      // inside one native expression (graft.functions.QuantileBucket);
      // nulls land in bucket 0
      coalesce(
        graft.functions.QuantileBucket.bucket(col(c).cast("double"), bounds),
        lit(0))
    }
    val n = cols.size
    val terms = for {
      i <- 0 until bitsPerCol
      j <- 0 until n
    } yield shiftleft(shiftright(buckets(j), i).bitwiseAND(lit(1)), i * n + j)
    terms.reduce(_ + _).cast("long")
  }

  /** Write `df` as `numFiles` Parquet files clustered along the Z-curve
    * of `cols`. Pair with `SkipIndex.build(path, cols)` for multi-column
    * file skipping.
    *
    * `bloomCols`: columns to write Parquet bloom filters for. Clustering
    * serves RANGE predicates on the clustered dims; a point lookup on a
    * high-cardinality column the layout does NOT order by (the "fetch
    * document N from the 100 TB corpus" access) still touches every
    * row group whose min/max straddles the value — on an unclustered id
    * that is all of them. A bloom filter answers "id definitely absent"
    * per row group from a few KB in the footer, so the reader (Spark's
    * parquet scan applies them automatically under filter pushdown)
    * skips all but the group that holds the row. Footer cost is per
    * column, opt-in by listing only the columns that get point lookups.
    */
  def zorderWrite(df: DataFrame, path: String, cols: Seq[String],
      numFiles: Int, bitsPerCol: Int = 8, bloomCols: Seq[String] = Nil): Unit = {
    val w = df.withColumn("__z", zvalue(df, cols, bitsPerCol))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite")
    bloomCols.foldLeft(w)((acc, c) =>
      acc.option(s"parquet.bloom.filter.enabled#$c", "true")).parquet(path)
  }

  /** Comparison layout: the same file count clustered on ONE column.
    * `bloomCols` as in [[zorderWrite]].
    */
  def linearWrite(df: DataFrame, path: String, sortCol: String, numFiles: Int,
      bloomCols: Seq[String] = Nil): Unit = {
    val w = df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite")
    bloomCols.foldLeft(w)((acc, c) =>
      acc.option(s"parquet.bloom.filter.enabled#$c", "true")).parquet(path)
  }
}
