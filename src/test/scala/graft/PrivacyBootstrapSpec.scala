package graft

import graft.operators.{Privacy, Sampling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** k-anonymity auditing + deterministic Poisson bootstrap. */
class PrivacyBootstrapSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val people = Seq(
    // (zip, age_band, id): "10001"/"30s" ×3, "10001"/"40s" ×1 (violates
    // k=2), "20002"/"30s" ×2, null zip ×1 (violates)
    ("10001", "30s", 1L), ("10001", "30s", 2L), ("10001", "30s", 3L),
    ("10001", "40s", 4L),
    ("20002", "30s", 5L), ("20002", "30s", 6L),
    (null, "30s", 7L)).toDF("zip", "age_band", "id")

  test("kAnonymityViolations and audit: exact groups, nulls count as values") {
    val bad = Privacy.kAnonymityViolations(people, Seq("zip", "age_band"), k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(bad == Set(("10001", "40s", 1L), (null, "30s", 1L)))
    val a = Privacy.kAnonymityAudit(people, Seq("zip", "age_band"), k = 2).collect().head
    assert((a.getLong(0), a.getLong(1), a.getLong(2), a.getLong(3)) == (4L, 2L, 2L, 1L))
  }

  test("suppress removes exactly the violating groups, null-safely") {
    val kept = Privacy.suppress(people, Seq("zip", "age_band"), k = 2)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 5L, 6L))
    // suppressed relation is k-anonymous by construction
    assert(Privacy.kAnonymityViolations(
      Privacy.suppress(people, Seq("zip", "age_band"), k = 2),
      Seq("zip", "age_band"), k = 2).count() == 0)
  }

  test("tCloseness: zero for corpus-matching groups, exact TVD for skewed ones") {
    // corpus: 8 'x' + 8 'y'. Group a matches (4x 4y) -> TVD 0.
    // Group b is all-x (4x 0y): TVD = 1/2 (|1/2| + |-1/2|) = 1/2.
    // Group c is 0x 4y: same by symmetry.
    val df = (Seq.fill(4)(("a", "x")) ++ Seq.fill(4)(("a", "y")) ++
      Seq.fill(4)(("b", "x")) ++ Seq.fill(4)(("c", "y"))).toDF("seg", "sens")
    val got = Privacy.tCloseness(df, Seq("seg"), "sens")
      .select("seg", "group_rows", "tvd_x1e6")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("a", 8L, 0L), ("b", 4L, 500000L), ("c", 4L, 500000L)))
    // partition invariance (exact integers end to end)
    val re = Privacy.tCloseness(df.repartition(7), Seq("seg"), "sens")
      .select("seg", "group_rows", "tvd_x1e6")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(re == got)
  }

  test("tCloseness: null sensitive values are a real category, not a zeroed cell") {
    // corpus: 4 null + 4 'x'; group a mirrors it exactly -> TVD must be
    // 0 (a plain equi-join on the grid would zero the null cell and
    // report 250000)
    val df = (Seq.fill(2)(("a", null: String)) ++ Seq.fill(2)(("a", "x")) ++
      Seq.fill(2)(("b", null: String)) ++ Seq.fill(2)(("b", "x"))).toDF("seg", "sens")
    val got = Privacy.tCloseness(df, Seq("seg"), "sens")
      .select("seg", "tvd_x1e6").as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 0L, "b" -> 0L), s"null category mis-scored: $got")
  }

  test("disparateImpact: exact fixed-point rates, four-fifths flag, fail-fast on all-negative") {
    // group a: 3/4 positive, group b: 2/4, group c: 4/4 (most favored)
    val df = Seq(
      ("a", true), ("a", true), ("a", true), ("a", false),
      ("b", true), ("b", true), ("b", false), ("b", false),
      ("c", true), ("c", true), ("c", true), ("c", true)
    ).toDF("g", "keep")
    val out = Privacy.disparateImpact(df, "g", col("keep"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("a", 4L, 3L, 750000000L, 750000000L),
      ("b", 4L, 2L, 500000000L, 500000000L),
      ("c", 4L, 4L, 1000000000L, 1000000000L)))
    // four-fifths rule reads straight off di_x1e9 (0.75 and 0.5 both
    // sit under the 0.8 line; the most-favored group never flags)
    assert(out.filter(_._5 < 800000000L).map(_._1).toSeq == Seq("a", "b"))
    // exact partition invariance (integer arithmetic end to end)
    val out2 = Privacy.disparateImpact(df.repartition(7), "g", col("keep"))
      .orderBy("g").collect().map(_.toString)
    assert(out2.toSeq == out.map(_ => "").zip(out2).map(_._2).toSeq &&
      out2.sameElements(Privacy.disparateImpact(df, "g", col("keep"))
        .orderBy("g").collect().map(_.toString)))
    // no positive outcome anywhere → ratio undefined → descriptive error
    val none = Seq(("a", false), ("b", false)).toDF("g", "keep")
    val e = intercept[Exception] {
      Privacy.disparateImpact(none, "g", col("keep")).collect()
    }
    assert(e.getMessage.contains("no group has a positive outcome") ||
      Option(e.getCause).exists(_.getMessage.contains("no group has a positive outcome")))
  }

  test("disparateImpact rate arithmetic survives the long-overflow bound (DECIMAL(38,0) product)") {
    // pos·10⁹ wraps a long once pos > ~9.2·10⁹ — a realistic group's
    // positive count at 100 TB. The production expression (exposed as
    // Privacy.rateX1e9Sql) widens the product to DECIMAL(38,0); drive it
    // with pre-aggregated (pos, n) literals at and beyond the bound and
    // check against BigInt ground truth. Same arithmetic as DuckDB's
    // HUGEINT sums, so the oracle agrees past the bound too.
    val cases = Seq(
      (9223372036L, 10000000000L),      // just under Long.Max/1e9
      (9223372037L, 10000000000L),      // first wrapping pos value
      (15000000000L, 20000000000L),     // deep past the bound
      (9999999999999L, 10000000000000L) // 10^13-scale groups
    )
    val df = cases.toDF("pos", "n")
    val got = df.select(col("pos"), col("n"),
        expr(Privacy.rateX1e9Sql).as("rate_x1e9"))
      .orderBy("pos").as[(Long, Long, Long)].collect().toSeq
    val want = cases.sortBy(_._1).map { case (p, n) =>
      (p, n, (BigInt(p) * 1000000000L / BigInt(n)).toLong) }
    assert(got == want, s"decimal rate diverged from BigInt truth: $got vs $want")
    // and the naive long form really does break there (wraps under
    // non-ANSI, throws under ANSI — either way not the exact rate)
    val naiveOk = try {
      Seq((9223372037L, 10000000000L)).toDF("pos", "n")
        .select(expr("pos * 1000000000 div n")).as[Long].head() == 922337203L
    } catch { case _: Throwable => false }
    assert(!naiveOk, "naive long arithmetic unexpectedly exact — bound stale?")
  }

  test("bootstrapCount: multiplicities bounded, mean ~1, replicates differ") {
    val df = (1L to 20000L).toDF("id")
      .select(col("id"),
        Sampling.bootstrapCount(col("id"), 0).as("m0"),
        Sampling.bootstrapCount(col("id"), 1).as("m1"))
    val rows = df.agg(min("m0"), max("m0"), avg("m0"), avg("m1"),
      sum(when(col("m0") =!= col("m1"), 1).otherwise(0))).collect().head
    assert(rows.getInt(0) >= 0 && rows.getInt(1) <= 8)
    assert(math.abs(rows.getDouble(2) - 1.0) < 0.03) // E[Poisson(1)] = 1
    assert(math.abs(rows.getDouble(3) - 1.0) < 0.03)
    assert(rows.getLong(4) > 10000L) // replicates are independent draws
  }

  test("bootstrapReplicates: deterministic under repartitioning, zeros dropped") {
    val base = (1L to 500L).toDF("id")
    val a = Sampling.bootstrapReplicates(base, "id", reps = 3)
      .orderBy("id", "replicate").collect().toSeq
    val b = Sampling.bootstrapReplicates(base.repartition(7), "id", reps = 3)
      .orderBy("id", "replicate").collect().toSeq
    assert(a == b)
    assert(a.forall(_.getInt(2) > 0))
    // ~36.8% of (row, replicate) pairs draw zero and are dropped
    val frac = a.size.toDouble / (500 * 3)
    assert(frac > 0.55 && frac < 0.72)
  }
}
