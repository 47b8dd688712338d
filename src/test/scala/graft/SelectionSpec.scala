package graft

import graft.operators.Selection
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance-resampling scores vs an independent local
  * reimplementation (own md5, own ln, same formulas).
  */
class SelectionSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    // target exemplars: alpha/beta language
    (1L, "alpha beta alpha beta", true),
    (2L, "alpha alpha beta", true),
    (3L, "beta alpha beta", true),
    // raw corpus: gamma/delta language plus two crossover docs
    (10L, "gamma delta gamma", false),
    (11L, "delta delta gamma gamma", false),
    (12L, "gamma delta", false),
    (13L, "alpha beta alpha", false), // target-like raw doc
    (14L, "", false))                 // empty: no evidence, omitted

  private def localScores(buckets: Int): Map[Long, Long] = {
    def bucket(tok: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest((tok + "dsir").getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16) % buckets
    }
    val toks = docs.map { case (id, text, tgt) =>
      (id, tgt, if (text.trim.isEmpty) Seq.empty[String]
                else text.trim.toLowerCase.split("\\s+").toSeq)
    }
    val ct = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val cr = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    toks.foreach { case (_, tgt, ts) =>
      ts.foreach(t => if (tgt) ct(bucket(t)) += 1 else cr(bucket(t)) += 1)
    }
    val tt = ct.values.sum.toDouble
    val tr = cr.values.sum.toDouble
    def slr(b: Long): Long =
      // HALF_UP over the double's decimal form — what Spark's round does
      java.math.BigDecimal.valueOf(
        math.log(((ct(b) + 1.0) / (tt + buckets)) /
          ((cr(b) + 1.0) / (tr + buckets))) * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    toks.filter(_._3.nonEmpty).map { case (id, _, ts) =>
      id -> ts.map(t => slr(bucket(t))).sum
    }.toMap
  }

  test("scores match the independent local model exactly") {
    val got = Selection.dsirScore(
        docs.toDF("doc_id", "text", "tgt"), "doc_id", "text", col("tgt"),
        buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == localScores(64))
  }

  test("target-like docs select, raw-like docs don't; empty doc omitted") {
    val sel = Selection.dsirScore(
        docs.toDF("doc_id", "text", "tgt"), "doc_id", "text", col("tgt"),
        buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(sel(1L) && sel(2L) && sel(3L), "target exemplars score positive")
    assert(sel(13L), "target-like raw doc is selected")
    assert(!sel(10L) && !sel(11L) && !sel(12L), "raw-like docs score negative")
    assert(!sel.contains(14L), "empty doc carries no evidence")
  }

  test("integer scores are invariant under input partitioning") {
    val df = docs.toDF("doc_id", "text", "tgt")
    val a = Selection.dsirScore(df, "doc_id", "text", col("tgt"), buckets = 64)
      .orderBy("id").collect().toSeq
    val b = Selection.dsirScore(df.repartition(5), "doc_id", "text", col("tgt"),
        buckets = 64)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }
}
