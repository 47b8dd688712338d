package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver testdata (one parquet per table, TESTDATA.md)
  * and temp-view registration so `spark.sql` serves the same surface the
  * reference exposes through Athena (reference README.md:128-133).
  */
object Tables {

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS); with
    // spark.sql.legacy.parquet.nanosAsLong it arrives as epoch-nanos Long.
    // Normalize to TimestampType (micros, truncating integer division — no
    // double round-trip: epoch nanos exceed 2^53).
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case None => df
    }
  }

  /** Register every testdata table as a temp view named as in FIXTURES.md §B. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    Schemas.testdataTables.foreach { t =>
      load(spark, sfDir, t).createOrReplaceTempView(t)
    }
}
