package graft

import graft.operators.Ingest
import org.apache.spark.sql.functions._

/** The DataSourceV2 connector for the batch-ingest boundary: value
  * parity with the DataFrame-synthesis path, per-city partitioning,
  * and column pruning pushed into the reader.
  */
class OpenMeteoSourceSpec extends SparkSpec {

  import spark.implicits._

  private val cities = Seq("Paris", "Tokyo", "New York")

  private def viaSource = spark.read.format("graft-openmeteo")
    .option("cities", cities.mkString(","))
    .option("date", "2026-08-12").option("hours", 24)
    .load()

  test("connector rows are bit-identical to the synthesized flatten path") {
    val fromSource = viaSource.orderBy("city", "timestamp").collect().toSeq
    val fromFrames = Ingest.flattenOpenMeteo(
      Ingest.syntheticOpenMeteo(spark, cities, "2026-08-12", 24))
      .orderBy("city", "timestamp").collect().toSeq
    assert(fromSource.size == cities.size * 24)
    assert(fromSource == fromFrames)
  }

  test("one input partition per city; column pruning reaches the reader") {
    assert(viaSource.rdd.getNumPartitions == cities.size)
    val pruned = viaSource.select("city", "temperature_c")
    // v2 scans print their (pruned) output attribute list, not ReadSchema
    val scan = pruned.queryExecution.executedPlan.toString
    assert("BatchScan [^\\[]*\\[city#\\d+, temperature_c#\\d+\\]".r.findFirstIn(scan).isDefined,
      s"projection not pushed into the scan:\n$scan")
    assert(pruned.count() == cities.size * 24)
  }

  test("micro-batch face: tick offsets give exactly-once rounds across restarts") {
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "om_stream").toString
    def run(): Unit = {
      val q = spark.readStream.format("graft-openmeteo")
        .option("cities", cities.mkString(","))
        .option("hours", 4).option("maxTicks", 3)
        .load()
        .writeStream.format("parquet").option("path", s"$root/out")
        .outputMode("append").option("checkpointLocation", s"$root/chk")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    run()
    val rows = spark.read.parquet(s"$root/out")
    assert(rows.count() == 3 * cities.size * 4) // 3 ticks x 3 cities x 4 hours
    // distinct per-round ingestion ids
    assert(rows.select("ingestion_id").distinct().count() == 3)
    // a restart with the same checkpoint has nothing left to fetch:
    // the committed offset already equals maxTicks (exactly-once)
    run()
    assert(spark.read.parquet(s"$root/out").count() == 3 * cities.size * 4)
  }

  test("missing cities option fails with a comprehensible error") {
    val e = intercept[Exception] {
      spark.read.format("graft-openmeteo").load().collect()
    }
    assert(e.getMessage != null)
  }
}
