package graft

import graft.functions.{CountMinFunctions, CountMinAgg}
import org.apache.spark.sql.functions._

/** Count-Min sketch: exact-regime guarantee for the a16 oracle, the
  * overestimate-only bound in the collision regime, and bit-identical
  * results under repartitioning (elementwise-add merge is exactly
  * associative — the property that makes the sketch safe at 100 TB).
  */
class CountMinSpec extends SparkSpec {

  import spark.implicits._

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  test("a16's five event types are in the 64x4 exact regime (string-only property)") {
    assert(CountMinFunctions.exactRegime(64, 4, eventTypes),
      "event types must each own a collision-free sketch row for the count(*) oracle to hold")
  }

  test("exact regime: estimates equal true counts; partition-invariant bit-for-bit") {
    val df = Seq.tabulate(1000)(i => eventTypes(i % 5)).toDF("item")
    val truth = df.groupBy("item").count().as[(String, Long)].collect().toMap

    def run(parts: Int): Map[String, Long] =
      df.repartition(parts)
        .agg(CountMinFunctions.count_min(col("item"), 64, 4, eventTypes).as("cms"))
        .select(explode(col("cms")).as("e"))
        .select("e.item", "e.est_cnt").as[(String, Long)].collect().toMap

    val one = run(1)
    assert(one == truth, s"exact regime must match true counts: $one vs $truth")
    assert(run(7) == one && run(32) == one, "sketch must be partitioning-invariant")
  }

  test("collision regime: never underestimates; bounded by true + total - true") {
    // 500 distinct items into width 8: collisions guaranteed.
    val n = 2000
    val df = Seq.tabulate(n)(i => s"item_${i % 500}").toDF("item")
    val probes = Seq("item_0", "item_17", "item_499", "absent_item")
    val est = df.agg(CountMinFunctions.count_min(col("item"), 8, 2, probes).as("cms"))
      .select(explode(col("cms")).as("e"))
      .select("e.item", "e.est_cnt").as[(String, Long)].collect().toMap
    val truth = df.groupBy("item").count().as[(String, Long)].collect().toMap
    probes.foreach { p =>
      val t = truth.getOrElse(p, 0L)
      assert(est(p) >= t, s"$p: CMS must never underestimate (${est(p)} < $t)")
      assert(est(p) <= n, s"$p: a cell can never exceed the total")
    }
  }

  test("nulls are skipped, not counted") {
    val df = Seq(Some("a"), None, Some("a"), None, Some("b")).toDF("item")
    val est = df.agg(CountMinFunctions.count_min(col("item"), 64, 4, Seq("a", "b")).as("cms"))
      .select(explode(col("cms")).as("e"))
      .select("e.item", "e.est_cnt").as[(String, Long)].collect().toMap
    assert(est == Map("a" -> 2L, "b" -> 1L))
  }

  test("count_min runs inside a streaming aggregation across micro-batches") {
    implicit val sc = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = mem.toDS().toDF("item")
      .agg(CountMinFunctions.count_min(col("item"), 64, 4, Seq("a", "b")).as("cms"))
      .select(explode(col("cms")).as("e"))
      .select("e.item", "e.est_cnt")
      .writeStream.outputMode("complete")
      .format("memory").queryName("cms_stream").start()
    try {
      mem.addData("a", "b", "a"); q.processAllAvailable()
      mem.addData("a", "b"); q.processAllAvailable()
      val got = spark.table("cms_stream").as[(String, Long)].collect().toMap
      assert(got == Map("a" -> 3L, "b" -> 2L),
        s"streaming sketch must equal the batch counts in the exact regime: $got")
    } finally q.stop()
  }

  test("tdigest runs inside a streaming aggregation with bounded rank error") {
    // the sketch's merge is NOT order-invariant (unlike CMS), so the
    // streaming contract is its rank-error bound over everything
    // arrived, not bit-parity with batch
    implicit val sc = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Double]
    val q = mem.toDS().toDF("v")
      .agg(graft.functions.TDigestFunctions
        .tdigest_quantiles(col("v"), Seq(0.5), 100).as("qs"))
      .select(element_at(col("qs"), 1).as("p50"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("td_stream").start()
    try {
      val all = (1 to 2000).map(_.toDouble)
      mem.addData(all.take(1000): _*); q.processAllAvailable()
      mem.addData(all.drop(1000): _*); q.processAllAvailable()
      val p50 = spark.table("td_stream").as[Double].head()
      // true median 1000.5 over 1..2000; 1% rank error = ±20 ranks
      assert(math.abs(p50 - 1000.5) <= 20.0,
        s"streaming p50 $p50 outside the 1% rank band of 1000.5")
    } finally q.stop()
  }

  test("cell addressing is a stable pure function of the bytes") {
    val idx = CountMinAgg.cellIndex("purchase".getBytes("UTF-8"), 3, 64)
    assert(idx == CountMinAgg.cellIndex("purchase".getBytes("UTF-8"), 3, 64))
    assert((0 until 4).forall(r =>
      CountMinAgg.cellIndex("x".getBytes("UTF-8"), r, 64) < 64))
  }
}
