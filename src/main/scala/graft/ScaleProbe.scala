package graft

import graft.operators.{Ingest, Transforms, Validation}
import graft.sources.IO
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe: drives the full reference pipeline shape at two orders of
  * magnitude above the bench SF to expose anything that only breaks or
  * degrades with volume (generator → validation single-pass → derive →
  * date-partitioned write → partition-pruned flagship query). Run:
  *   sbt "runMain graft.ScaleProbe 12000000"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(12000000L)
    val out = "target/scaleprobe"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val cities = Seq("New York", "Tokyo", "Sao Paulo", "Berlin", "Nairobi",
      "Sydney", "Mumbai", "Cairo")
    val ticks = (rows / (cities.size * 3)).toInt
    // compress the tick interval so the probe spans ~30 days of event time
    // (realistic hourly-sweep shape), not one day per 288 ticks
    val tickSeconds = math.max(1, (30L * 86400 / ticks).toInt)

    val raw = Ingest.syntheticIotBatch(spark, cities, sensorsPerCity = 3,
      ticks = ticks, tickSeconds = tickSeconds)
    val n = timed(s"generate+count ($rows rows)")(raw.count())

    timed("validation suite (1 pass)") {
      val report = Validation.validate(raw, "probe", Validation.iotSuite)
      assert(report.expectationsEvaluated == 9)
    }

    timed("derive + partitioned write (compacted)") {
      IO.writeCuratedParquet(Transforms.deriveIot(raw), out,
        compact = true, filesPerPartition = 4)
    }

    val curated = spark.read.parquet(out)
    timed("flagship group-by over curated") {
      curated.groupBy("city").agg(count(lit(1))).collect()
    }
    timed("partition-pruned single-date count") {
      val d = curated.select(max(col("date"))).head().getString(0)
      curated.filter(col("date") === d).count()
    }
    println(s"[probe] total rows written: $n, partitions: " +
      new java.io.File(out).listFiles().count(_.getName.startsWith("date=")))
    spark.stop()
  }
}
