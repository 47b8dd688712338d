package graft

import graft.operators.{Intervals, Scd}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sweep-line interval analytics + SCD Type 2 gaps-and-islands. */
class IntervalScdSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("maxConcurrent: hand-computed overlap, half-open boundaries") {
    // key a: [0,10) [5,15) [10,20) — at t=10 the first closes AS the third
    // opens, so max is 2, not 3. key b: disjoint singletons → 1.
    val iv = Seq(
      ("a", 0L, 10L), ("a", 5L, 15L), ("a", 10L, 20L),
      ("b", 0L, 1L), ("b", 2L, 3L)).toDF("k", "s", "e")
    val got = Intervals.maxConcurrent(iv, col("s"), col("e"), Seq("k"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a", 2L), ("b", 1L)))
  }

  test("maxConcurrent equals the brute-force sweep on random intervals") {
    val rnd = new scala.util.Random(7)
    val ivs = Seq.fill(300) {
      val s = rnd.nextInt(1000).toLong
      ("k", s, s + 1 + rnd.nextInt(50))
    }
    val got = Intervals.maxConcurrent(ivs.toDF("k", "s", "e"), col("s"), col("e"), Seq("k"))
      .collect().head.getLong(1)
    // Brute force: concurrency at each start instant (max is always
    // attained at some interval's start under half-open semantics).
    val naive = ivs.map(_._2).map(t => ivs.count(iv => iv._2 <= t && t < iv._3)).max
    assert(got == naive.toLong)
  }

  test("overlapJoin equals the naive theta join; half-open boundaries; exactly-once pairs") {
    val rnd = new scala.util.Random(31)
    val as = Seq.tabulate(120) { i =>
      val s = rnd.nextInt(2000).toLong
      (i.toLong, s, s + 1 + rnd.nextInt(300))
    }
    val bs = Seq.tabulate(150) { j =>
      val s = rnd.nextInt(2000).toLong
      (j.toLong, s, s + 1 + rnd.nextInt(80))
    }
    val a = as.toDF("a_id", "a_s", "a_e").repartition(7)
    val b = bs.toDF("b_id", "b_s", "b_e").repartition(5)
    // narrow cells (width 64) force MANY shared cells per pair — the
    // first-shared-cell rule must still emit each pair exactly once
    val got = Intervals.overlapJoin(a, "a_s", "a_e", b, "b_s", "b_e",
        bucketWidthUs = 64, maxBucketsPerInterval = 64)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    val naive = for {
      (ai, s1, e1) <- as; (bi, s2, e2) <- bs
      if s1 < e2 && s2 < e1
    } yield (ai, bi)
    assert(got.sorted == naive.sorted,
      s"bucketed overlap join must equal the theta join: got ${got.size}, naive ${naive.size}")
    assert(got.size == got.distinct.size, "pairs must be exactly-once")
    // touching half-open intervals [0,10) and [10,20) do NOT overlap
    val t1 = Seq((1L, 0L, 10L)).toDF("a_id", "a_s", "a_e")
    val t2 = Seq((2L, 10L, 20L)).toDF("b_id", "b_s", "b_e")
    assert(Intervals.overlapJoin(t1, "a_s", "a_e", t2, "b_s", "b_e", 8).isEmpty)
    // fail-fasts ride the used expression: inverted interval, fan-out bound
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + chain(t.getCause)
    val inv = Seq((1L, 50L, 50L)).toDF("a_id", "a_s", "a_e")
    val e1 = intercept[Exception](
      Intervals.overlapJoin(inv, "a_s", "a_e", t2, "b_s", "b_e", 8).collect())
    assert(chain(e1).contains("empty, or inverted"), chain(e1))
    val long = Seq((1L, 0L, 100000L)).toDF("a_id", "a_s", "a_e")
    val e2 = intercept[Exception](
      Intervals.overlapJoin(long, "a_s", "a_e", t2, "b_s", "b_e", 8,
        maxBucketsPerInterval = 16).collect())
    assert(chain(e2).contains("maxBucketsPerInterval"), chain(e2))
  }

  test("coveredMicros: merged union length, gaps excluded") {
    // [0,10) ∪ [5,15) ∪ [20,25) → 15 + 5 = 20; singleton key → 3.
    val iv = Seq(
      ("a", 0L, 10L), ("a", 5L, 15L), ("a", 20L, 25L),
      ("b", 100L, 103L)).toDF("k", "s", "e")
    val got = Intervals.coveredMicros(iv, col("s"), col("e"), Seq("k"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a", 20L), ("b", 3L)))
  }

  test("scd type2: runs collapse, bounds chain, last run is current") {
    val log = Seq(
      (1L, "x", 10L, 1L), (1L, "x", 20L, 2L), (1L, "y", 30L, 3L),
      (1L, "x", 40L, 4L), // x returns: a NEW version, not merged with run 1
      (2L, "z", 5L, 5L)).toDF("uid", "attr", "t", "eid")
    val got = Scd.type2(log, "uid", "attr", Seq(col("t"), col("eid")))
      .orderBy("uid", "version")
      .select("uid", "version", "attr", "valid_from", "valid_to", "is_current")
      .collect()
    assert(got.toSeq == Seq(
      Row(1L, 1L, "x", 10L, 30L, false),
      Row(1L, 2L, "y", 30L, 40L, false),
      Row(1L, 3L, "x", 40L, null, true),
      Row(2L, 1L, "z", 5L, null, true)))
  }

  test("scd type2: null attribute values form their own runs (null-safe)") {
    val log = Seq(
      (1L, Some("x"), 10L, 1L), (1L, None, 20L, 2L), (1L, None, 30L, 3L),
      (1L, Some("x"), 40L, 4L),
      (2L, None, 5L, 5L) // null on the FIRST row still starts version 1
    ).toDF("uid", "attr", "t", "eid")
    val got = Scd.type2(log, "uid", "attr", Seq(col("t"), col("eid")))
      .orderBy("uid", "version")
      .select("uid", "version", "attr", "valid_from", "valid_to", "is_current")
      .collect()
    assert(got.toSeq == Seq(
      Row(1L, 1L, "x", 10L, 20L, false),
      Row(1L, 2L, null, 20L, 40L, false), // null run kept, not folded into x
      Row(1L, 3L, "x", 40L, null, true),
      Row(2L, 1L, null, 5L, null, true)))
  }

  test("maxConcurrent/coveredMicros drop null-endpoint intervals") {
    val iv = Seq(
      ("a", Some(0L), Some(10L)), ("a", None, Some(5L)), ("a", Some(3L), None))
      .toDF("k", "s", "e")
    val mc = Intervals.maxConcurrent(iv, col("s"), col("e"), Seq("k")).collect()
    assert(mc.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 1L)))
    val cv = Intervals.coveredMicros(iv, col("s"), col("e"), Seq("k")).collect()
    assert(cv.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 10L)))
  }

  test("scd type2: valid_to of run k equals valid_from of run k+1 (no gaps)") {
    val rnd = new scala.util.Random(11)
    val log = (1 to 500).map { i =>
      (rnd.nextInt(5).toLong, s"v${rnd.nextInt(3)}", i.toLong * 10, i.toLong)
    }.toDF("uid", "attr", "t", "eid")
    val dim = Scd.type2(log, "uid", "attr", Seq(col("t"), col("eid"))).cache()
    val gaps = dim.as("a").join(dim.as("b"),
        col("a.uid") === col("b.uid") && col("a.version") + 1 === col("b.version"))
      .filter(col("a.valid_to") =!= col("b.valid_from"))
    assert(gaps.count() == 0)
    // exactly one current row per key; every observation falls inside its run
    assert(dim.filter(col("is_current")).groupBy("uid").count()
      .filter(col("count") =!= 1).count() == 0)
    dim.unpersist()
  }
}
