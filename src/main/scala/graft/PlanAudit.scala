package graft

import org.apache.spark.sql.SparkSession

/** Prints executed-plan summaries for selected queries so shuffle count,
  * broadcast choice, pushdown, and codegen spans can be audited. Run:
  *   sbt "runMain graft.PlanAudit sf0.01 q1_pricing_summary j1_broadcast_dim_join"
  * With no query names: audits a representative set.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = s"/root/testdata/${args.headOption.getOrElse("sf0.01")}"
    val names = if (args.length > 1) args.tail.toSeq else Seq(
      "q1_pricing_summary", "j1_broadcast_dim_join", "j2_fact_join_agg",
      "p2_range_filter", "a3_filtered_count", "d5_minhash_lsh",
      "v1_knn_brute", "set1_intersect", "sub1_above_avg", "w1_window_topn")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.queries
    // compact sweep mode: one line per registry query — exchange and
    // scan counts only, for finding repeated-subtree offenders cheaply
    if (args.length > 1 && args(1) == "--all") {
      qs.foreach { case (n, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.executedPlan.toString
          def c(p: String) = p.r.findAllIn(plan).size
          // "Exchange" alone also matches inside "BroadcastExchange"
          // (ADVICE r16) — subtract so the column is SHUFFLE exchanges
          println(f"[sweep] $n%-34s shuf=${c("Exchange") - c("BroadcastExchange")}%3d bcast=${c("BroadcastExchange")}%3d pq=${c("Scan parquet")}%3d rdd=${c("Scan ExistingRDD")}%3d local=${c("LocalTableScan")}%3d")
        } catch { case e: Throwable =>
          println(s"[sweep] $n FAILED ${e.getClass.getSimpleName}")
        } finally {
          spark.sharedState.cacheManager.clearCache()
          graft.operators.Materialize.sweep()
        }
      }
      spark.stop(); return
    }
    names.foreach { n =>
      println(s"\n======== $n ========")
      val df = qs(n)(spark, sfDir)
      df.explain("formatted")
      val plan = df.queryExecution.executedPlan.toString
      val shuffles = "Exchange".r.findAllIn(plan).size
      val bcasts = "BroadcastExchange".r.findAllIn(plan).size
      println(s"[audit] exchanges=$shuffles (broadcast=$bcasts, shuffle=${shuffles - bcasts})")
    }
    spark.stop()
  }
}
