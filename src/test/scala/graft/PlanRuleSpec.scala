package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** The injected optimizer rule (JaccardPrefilterRule): threshold
  * predicates over provably-distinct shingle sets gain a size-ratio
  * prefilter; opaque columns and OR-nested predicates do not.
  */
class PlanRuleSpec extends SparkSpec {

  import spark.implicits._

  private def withRule[T](f: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ graft.plans.JaccardPrefilterRule
    try f finally spark.experimental.extraOptimizations = prev
  }

  // parquet-backed (a local Seq would be folded to a LocalRelation by
  // ConvertToLocalRelation before the plan can be inspected)
  private lazy val docs = graft.sources.Tables
    .load(spark, "/root/testdata/sf0.001", "documents")
    .select(col("doc_id").as("id"), col("text").as("ta"),
      concat(col("text"), lit(" zz qq")).as("tb"))

  private def jaccardFilter = docs.filter(
    graft.functions.SketchFunctions.jaccard_sim(
      TextAnalysis.shingles(col("ta"), 2),
      TextAnalysis.shingles(col("tb"), 2)) >= 0.5)

  test("rule injects size bounds for distinct-by-construction inputs; results unchanged") {
    val without = jaccardFilter.select("id").as[Long].collect().toSet
    withRule {
      val plan = jaccardFilter.queryExecution.optimizedPlan.toString
      assert(plan.contains("size("), s"expected size prefilter in:\n$plan")
      // idempotent under the fixed-point batch: exactly 2 bounds, not 4+
      assert("size\\(".r.findAllIn(plan).size == 4, // 2 bounds x 2 size() each
        s"bounds duplicated (rule not idempotent?):\n$plan")
      val withR = jaccardFilter.select("id").as[Long].collect().toSet
      assert(withR == without)
    }
  }

  test("rule leaves opaque columns and OR-nested predicates alone") {
    withRule {
      // opaque column: distinctness not provable -> no rewrite
      val sh = docs.select(col("id"),
        TextAnalysis.shingles(col("ta"), 2).as("sa"),
        TextAnalysis.shingles(col("tb"), 2).as("sb"))
      val opaque = sh.filter(
        graft.functions.SketchFunctions.jaccard_sim(col("sa"), col("sb")) >= 0.5)
      // CollapseProject may reinline the shingle exprs (making them
      // provable again) — materialize the columns through a local limit
      // barrier-free checkpointless shape: an aggregate breaks inlining
      val grouped = sh.groupBy("id").agg(first("sa").as("sa"), first("sb").as("sb"))
        .filter(graft.functions.SketchFunctions.jaccard_sim(col("sa"), col("sb")) >= 0.5)
      val planG = grouped.queryExecution.optimizedPlan.toString
      assert(!planG.contains("size("), s"opaque columns must not be rewritten:\n$planG")

      // OR-nested: no top-level bound may appear
      val orPlan = docs.filter(
        graft.functions.SketchFunctions.jaccard_sim(
          TextAnalysis.shingles(col("ta"), 2),
          TextAnalysis.shingles(col("tb"), 2)) >= 0.5 || col("id") === 2L)
        .queryExecution.optimizedPlan.toString
      assert(!orPlan.contains("size("), s"OR-nested predicate must not be strengthened:\n$orPlan")
      assert(opaque.count() >= 0) // exercised
    }
  }
}
