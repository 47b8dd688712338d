package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** removeDupSpans hand cases: cross-doc and within-doc duplicated
  * grams, overlapping span union, boundary survivors, short docs.
  */
class DupSpanRemovalSpec extends SparkSpec {

  import spark.implicits._

  private def run(k: Int, docs: (Long, String)*): Map[Long, (Long, Long, String)] =
    TextAnalysis.removeDupSpans(docs.toDF("doc_id", "text"), k)
      .select("doc_id", "n_tokens", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("cross-doc duplicated 2-gram is cut from both docs, boundaries survive") {
    val out = run(2,
      1L -> "alpha shared span omega",
      2L -> "start shared span end")
    // "shared span" occurs twice -> tokens 1,2 cut in both docs
    assert(out(1L) == ((4L, 2L, "alpha omega")))
    assert(out(2L) == ((4L, 2L, "start end")))
  }

  test("within-doc repeat counts as duplicated; overlapping spans union") {
    val out = run(2, 5L -> "a b a b c")
    // grams: [a b](0) [b a](1) [a b](2) [b c](3); "a b" repeats ->
    // positions 0 and 2 cover tokens 0..1 and 2..3; token 4 'c' survives
    assert(out(5L) == ((5L, 4L, "c")))
  }

  test("docs shorter than k are untouched; unique docs keep every token") {
    val out = run(3,
      7L -> "xx yy",
      8L -> "only unique tokens here now",
      9L -> "only unique tokens here now")
    assert(out(7L) == ((2L, 0L, "xx yy")))
    // docs 8 and 9 are identical: every 3-gram duplicated, all cut
    assert(out(8L) == ((5L, 5L, "")))
    assert(out(9L) == ((5L, 5L, "")))
  }

  test("result is partitioning-invariant") {
    val docs = (0L until 200L).map(i =>
      (i, s"w${i % 7} w${(i + 1) % 7} w${(i + 2) % 5} tail$i"))
    val one = TextAnalysis.removeDupSpans(docs.toDF("doc_id", "text").repartition(1), 2)
      .select("doc_id", "n_removed", "clean_text")
      .as[(Long, Long, String)].collect().toSet
    val many = TextAnalysis.removeDupSpans(docs.toDF("doc_id", "text").repartition(13), 2)
      .select("doc_id", "n_removed", "clean_text")
      .as[(Long, Long, String)].collect().toSet
    assert(one == many)
  }
}
