package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support for co-located fact-fact joins. Two tables
  * bucketed (and sorted) on the same key with the same bucket count join
  * with ZERO shuffle on either side — at 100 TB this turns the recurring
  * orders⋈lineitem-class join from the dominant network cost into a local
  * merge per bucket. Bucket count should target post-compaction bucket
  * files of a few hundred MB at production scale.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — planner elides
    * both Exchanges (verify with `.explain`: SortMergeJoin with no
    * ShuffleExchange children).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
