package graft

import graft.operators.Graph
import graft.sources.{Bucketing, Tables}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** Co-located bucketed join: both Exchanges elided from the plan. */
class BucketingSpec extends SparkSpec {

  /** Count bucketed parquet scans whose path UP to the nearest join
    * ancestor crosses no ShuffleExchange — i.e. the join consumed the
    * scan's bucket partitioning directly. (free, totalBucketedScans).
    */
  private def bucketedScanJoinPaths(plan: SparkPlan): (Int, Int) = {
    var free = 0
    var total = 0
    def walk(node: SparkPlan, exchangeSinceJoin: Boolean): Unit = node match {
      case s: FileSourceScanExec =>
        if (s.bucketedScan) {
          total += 1
          if (!exchangeSinceJoin) free += 1
        }
      case _: ShuffleExchangeExec =>
        node.children.foreach(walk(_, exchangeSinceJoin = true))
      case _: SortMergeJoinExec | _: ShuffledHashJoinExec | _: BroadcastHashJoinExec =>
        node.children.foreach(walk(_, exchangeSinceJoin = false))
      case _ =>
        node.children.foreach(walk(_, exchangeSinceJoin))
    }
    walk(plan, exchangeSinceJoin = true)
    (free, total)
  }

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

  test("pageRank over a src-bucketed edge table: every per-iteration edge-side join " +
      "reuses the bucket partitioning (no Exchange above the bucketed scan)") {
    // The Graph.pageRank scaladoc claims the contribution join shuffles
    // on the SAME key every iteration, so a bucketed edge list reuses
    // its exchange across iterations. Assert it structurally: in the
    // physical plan, count bucketed scans whose path to the nearest join
    // crosses no ShuffleExchange. With src-bucketing, the edge and
    // out-degree sides of every iteration's joins ride the bucket
    // partitioning — strictly more than `iterations` exchange-free
    // paths; with a plain parquet copy of the same data, ZERO paths are
    // exchange-free (the control that proves the assertion bites). If
    // someone breaks the same-key invariant, the free count collapses
    // and this test fails.
    val edges = spark.range(5000).select(
      pmod(xxhash64(col("id"), lit(1)), lit(500)).as("src"),
      pmod(xxhash64(col("id"), lit(2)), lit(500)).as("dst"))
      .filter(col("src") =!= col("dst"))
    Bucketing.writeBucketed(edges, "edges_b", "src", 4)
    edges.write.mode("overwrite").parquet("target/edges_plain")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val iterations = 2
      // materializeEdges = false: the point here is the BUCKET layout
      // carrying the per-iteration joins; the default edge pin would
      // swap the bucketed scan for an RDD scan (see pageRank scaladoc)
      val bucketed = Graph.pageRank(spark.table("edges_b"), "src", "dst",
        iterations = iterations, materializeEdges = false)
      val (free, total) = bucketedScanJoinPaths(bucketed.queryExecution.executedPlan)
      assert(total > 0, "bucketed table must actually plan bucketed scans")
      assert(free > iterations,
        s"expected > $iterations exchange-free scan->join paths, got $free of $total")

      val plain = Graph.pageRank(spark.read.parquet("target/edges_plain"),
        "src", "dst", iterations = iterations, materializeEdges = false)
      val (pFree, pTotal) = bucketedScanJoinPaths(plain.queryExecution.executedPlan)
      assert(pTotal == 0 && pFree == 0,
        s"control: plain parquet must plan no bucketed scans, got $pFree/$pTotal")
      val plainPlanStr = plain.queryExecution.executedPlan.toString
      assert(plainPlanStr.contains("Exchange hashpartitioning"),
        "control: the un-bucketed plan must contain the shuffles bucketing elides")

      // and bucketing moved no arithmetic: ranks are bit-identical
      val a = bucketed.orderBy("id").collect().toSeq
      val b = plain.orderBy("id").collect().toSeq
      assert(a == b, "bucketed and plain pageRank must agree exactly")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS edges_b")
    }
  }
}
