package graft

import graft.sources.{Bucketing, Tables}

/** Co-located bucketed join: both Exchanges elided from the plan. */
class BucketingSpec extends SparkSpec {

  test("same-bucketed tables join without any shuffle exchange") {
    val sfDir = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(Tables.load(spark, sfDir, "orders"),
      "orders_b", "o_orderkey", 4)
    Bucketing.writeBucketed(Tables.load(spark, sfDir, "lineitem"),
      "lineitem_b", "l_orderkey", 4)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "orders_b", "lineitem_b",
        "o_orderkey", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // and it is still correct
      val expected = Tables.load(spark, sfDir, "lineitem").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
