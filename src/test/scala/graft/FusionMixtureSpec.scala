package graft

import graft.operators.{Retrieval, Sampling}
import org.apache.spark.sql.functions._

/** Temperature mixture: quota arithmetic, monotonicity in targetN,
  * partition invariance. RRF fusion: hand-computed integer scores,
  * single-list degeneration, tie-break totality.
  */
class FusionMixtureSpec extends SparkSpec {

  import spark.implicits._

  private def docs(perSource: Map[String, Int]) = {
    val rows = perSource.toSeq.sortBy(_._1).zipWithIndex.flatMap {
      case ((src, n), si) => (0 until n).map(i => (si * 100000L + i, src, 100L))
    }
    rows.toDF("doc_id", "source", "n_chars")
  }

  test("temperature quotas follow floor(targetN * sqrt(chars_s) / sum sqrt)") {
    // chars: a=400*100=40000 (s=200), b=100*100=10000 (s=100) -> stot=300
    val df = docs(Map("a" -> 400, "b" -> 100))
    val out = Sampling.temperatureSample(df, "source", "doc_id", "n_chars", targetN = 60L)
    val bySrc = out.groupBy("source").count().as[(String, Long)].collect().toMap
    // quota_a = 60*200/300 = 40; quota_b = 60*100/300 = 20
    assert(bySrc == Map("a" -> 40L, "b" -> 20L), s"got $bySrc")
    // alpha=1/2 pulls the 4:1 corpus toward 2:1 in the sample
    assert(bySrc("a") == 2 * bySrc("b"))
  }

  test("temperature selection is monotone in targetN and partition-invariant") {
    val df = docs(Map("a" -> 50, "b" -> 200, "c" -> 10))
    def ids(n: Long, parts: Int) =
      Sampling.temperatureSample(df.repartition(parts), "source", "doc_id",
        "n_chars", n).select("doc_id").as[Long].collect().toSet
    val small = ids(30, 4)
    val big = ids(90, 4)
    assert(small.subsetOf(big), "larger budget must only add rows")
    assert(ids(30, 1) == small && ids(30, 13) == small,
      "kept set must not depend on partitioning")
  }

  test("temperature sampling fails fast on null or zero-mass cost input") {
    val nullCost = Seq((1L, "a", Some(10L)), (2L, "a", None), (3L, "b", Some(5L)))
      .toDF("doc_id", "source", "n_chars")
    val e = intercept[IllegalArgumentException] {
      Sampling.temperatureSample(nullCost, "source", "doc_id", "n_chars", 10L)
        .count()
    }
    assert(e.getMessage.contains("null or uncastable"))
    val zeroMass = Seq((1L, "a", 0L), (2L, "b", 0L))
      .toDF("doc_id", "source", "n_chars")
    val e2 = intercept[IllegalArgumentException] {
      Sampling.temperatureSample(zeroMass, "source", "doc_id", "n_chars", 10L)
        .count()
    }
    assert(e2.getMessage.contains("zero"))
  }

  test("rrf fusion: exact integer scores, missing ranks contribute zero") {
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val sem = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(lex, sem, "id", topK = 10)
      .select("id", "rrf_x1e12").as[(Long, Long)].collect().toMap
    val e = (r: Int) => 1000000000000L / (60 + r)
    assert(out == Map(
      20L -> (e(2) + e(1)), // in both lists
      10L -> e(1), 30L -> e(3), 40L -> e(2)))
    // doc in both lists outranks the single-list leaders here
    val first = Retrieval.rrfFuse(lex, sem, "id", topK = 1)
      .select("id").as[Long].head()
    assert(first == 20L)
  }

  test("rrf fusion ties break by id for a total order") {
    val lex = Seq((5L, 1), (9L, 2)).toDF("id", "rank")
    val sem = Seq((9L, 1), (5L, 2)).toDF("id", "rank")
    val ids = Retrieval.rrfFuse(lex, sem, "id", topK = 2)
      .select("id").as[Long].collect().toSeq
    assert(ids == Seq(5L, 9L), "equal scores must order by id ascending")
  }
}
