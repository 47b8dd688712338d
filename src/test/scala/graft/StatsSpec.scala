package graft

import graft.operators.Stats
import org.apache.spark.sql.functions._

/** Exact two-sample KS: hand-computed fixture, tie-break, partitioning
  * invariance, fail-fasts.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("ksTwoSample: hand-computed distance, argmax location, partitioning invariance") {
    // a = {1,2,3}, b = {2,3,4,4}: cum_a = 1,2,3,3; cum_b = 0,1,2,4
    // |cum_a*4 - cum_b*3| = 4, 5, 6, 0 -> max 6 at v=3; D = 6/12 = 0.5
    val df = Seq((0L, 1L), (0L, 2L), (0L, 3L),
      (1L, 2L), (1L, 3L), (1L, 4L), (1L, 4L)).toDF("side", "v")
    val r = Stats.ksTwoSample(df, "side", "v").collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 4)
    assert(r.getLong(2) == 500000000L, s"ks_x1e9 = ${r.getLong(2)}")
    assert(r.getLong(3) == 3L, s"at_value = ${r.getLong(3)}")
    val r2 = Stats.ksTwoSample(df.repartition(5), "side", "v").collect()(0)
    assert(r2 == r, "partitioning must not move the statistic")
  }

  test("ksTwoSample: identical samples give D = 0 at the LOWEST value (tie-break)") {
    val df = Seq((0L, 7L), (0L, 9L), (1L, 7L), (1L, 9L)).toDF("side", "v")
    val r = Stats.ksTwoSample(df, "side", "v").collect()(0)
    assert(r.getLong(2) == 0L && r.getLong(3) == 7L)
  }

  test("ksTwoSample fail-fasts: bad side code, null value, empty cohort") {
    val bad = Seq((2L, 1L), (0L, 2L)).toDF("side", "v")
    val e1 = intercept[Exception](
      Stats.ksTwoSample(bad, "side", "v").collect())
    assert(e1.getMessage.contains("must be 0/1"))
    val nul = Seq((Option(0L), Option.empty[Long]),
      (Option(1L), Option(2L))).toDF("side", "v")
    val e2 = intercept[Exception](
      Stats.ksTwoSample(nul, "side", "v").collect())
    assert(e2.getMessage.contains("null value"))
    val oneSided = Seq((0L, 1L), (0L, 2L)).toDF("side", "v")
    val e3 = intercept[Exception](
      Stats.ksTwoSample(oneSided, "side", "v").collect())
    assert(e3.getMessage.contains("cohort is empty"))
  }
}
