package graft

import graft.functions.TopKFunctions.top_k
import graft.operators.Similarity
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded-heap top-k aggregate: equivalence with the window formulation,
  * tiebreaks, and partial-merge correctness across many partitions.
  */
class TopKAggSpec extends SparkSpec {

  import spark.implicits._

  test("top_k equals window row_number for every key (random data, 16 partitions)") {
    val df = spark.range(10000).repartition(16)
      .select(
        pmod(col("id"), lit(7L)).as("key"),
        (pmod(xxhash64(col("id")), lit(100000L)).cast("double") / 1000).as("score"),
        col("id"))
    val viaAgg = Similarity.topKPerKey(df, "key", col("score"), col("id"), 5)
      .select("key", "rank", "id", "score")
    val w = Window.partitionBy("key").orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("key", "rank", "id", "score")
    assert(viaAgg.except(viaWindow).isEmpty && viaWindow.except(viaAgg).isEmpty)
  }

  test("ties break by ascending id; groups smaller than k emit all rows") {
    val df = Seq(
      ("a", 1.0, 10L), ("a", 1.0, 3L), ("a", 1.0, 7L), ("b", 5.0, 1L))
      .toDF("key", "score", "id")
    val out = df.groupBy("key").agg(top_k(col("score"), col("id"), 2).as("tk"))
      .select(col("key"), col("tk"))
      .as[(String, Seq[(Double, Long)])].collect().toMap
    assert(out("a").map(_._2) == Seq(3L, 7L)) // ascending id among equal scores
    assert(out("b") == Seq((5.0, 1L)))        // group smaller than k
  }

  test("null scores and ids are skipped") {
    val df = Seq(
      ("a", Some(1.0), Some(1L)), ("a", None, Some(2L)), ("a", Some(3.0), None))
      .toDF("key", "score", "id")
    val out = df.groupBy("key").agg(top_k(col("score"), col("id"), 5).as("tk"))
      .select("tk").as[Seq[(Double, Long)]].head()
    assert(out == Seq((1.0, 1L)))
  }
}
