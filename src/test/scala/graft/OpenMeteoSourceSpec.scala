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

  test("missing cities option fails with a comprehensible error") {
    val e = intercept[Exception] {
      spark.read.format("graft-openmeteo").load().collect()
    }
    assert(e.getMessage != null)
  }
}
