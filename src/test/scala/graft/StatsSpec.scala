package graft

import graft.operators.Stats
import org.apache.spark.sql.functions._

/** Exact two-sample KS: hand-computed fixture, tie-break, partitioning
  * invariance, fail-fasts.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("ksTwoSample: hand-computed distance, argmax location, partitioning invariance") {
    // a = {1,2,3}, b = {2,3,4,4}: cum_a = 1,2,3,3; cum_b = 0,1,2,4
    // |cum_a*4 - cum_b*3| = 4, 5, 6, 0 -> max 6 at v=3; D = 6/12 = 0.5
    val df = Seq((0L, 1L), (0L, 2L), (0L, 3L),
      (1L, 2L), (1L, 3L), (1L, 4L), (1L, 4L)).toDF("side", "v")
    val r = Stats.ksTwoSample(df, "side", "v").collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 4)
    assert(r.getLong(2) == 500000000L, s"ks_x1e9 = ${r.getLong(2)}")
    assert(r.getLong(3) == 3L, s"at_value = ${r.getLong(3)}")
    val r2 = Stats.ksTwoSample(df.repartition(5), "side", "v").collect()(0)
    assert(r2 == r, "partitioning must not move the statistic")
  }

  test("ksTwoSample: identical samples give D = 0 at the LOWEST value (tie-break)") {
    val df = Seq((0L, 7L), (0L, 9L), (1L, 7L), (1L, 9L)).toDF("side", "v")
    val r = Stats.ksTwoSample(df, "side", "v").collect()(0)
    assert(r.getLong(2) == 0L && r.getLong(3) == 7L)
  }

  test("madSummary: hand-computed median/MAD/outliers, even-n lower median, partitioning invariance") {
    // group A (n=7): values 1,2,3,4,5,6,100 -> median = 4 (rank 4);
    // |x-4| = 3,2,1,0,1,2,96 -> sorted 0,1,1,2,2,3,96 -> MAD = 2
    // (rank 4); outliers: |x-4| > 5*2=10 -> only 100. group B (n=4):
    // 10,20,30,40 -> LOWER median rank (4+1) DIV 2 = 2 -> 20;
    // |x-20| = 10,0,10,20 -> sorted 0,10,10,20 -> MAD rank 2 = 10;
    // outliers: d > 50 -> none.
    val df = (Seq(1L, 2L, 3L, 4L, 5L, 6L, 100L).map(("a", _)) ++
      Seq(10L, 20L, 30L, 40L).map(("b", _))).toDF("g", "v")
    val got = graft.operators.Stats.madSummary(df, "g", "v")
      .orderBy("g").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 7L, 4L, 2L, 1L), ("b", 4L, 20L, 10L, 0L)))
    graft.operators.Materialize.sweep()
    val got2 = graft.operators.Stats.madSummary(df.repartition(5), "g", "v")
      .orderBy("g").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got2 == got, "partitioning must not move the summary")
    graft.operators.Materialize.sweep()
    // degenerate majority value: MAD = 0, Hampel degenerates to "any
    // deviation" — the documented caveat, pinned
    val degen = Seq(("c", 5L), ("c", 5L), ("c", 5L), ("c", 9L)).toDF("g", "v")
    val d = graft.operators.Stats.madSummary(degen, "g", "v")
      .as[(String, Long, Long, Long, Long)].head()
    assert(d == (("c", 4L, 5L, 0L, 1L)))
    graft.operators.Materialize.sweep()
    // null value fails fast
    val nul = Seq(("a", Option(1L)), ("a", Option.empty[Long])).toDF("g", "v")
    val e = intercept[Exception](
      graft.operators.Stats.madSummary(nul, "g", "v").collect())
    assert(e.getMessage.contains("null value"))
    graft.operators.Materialize.sweep()
  }

  test("wilcoxonSignedRank: hand-computed W+/W- with ties and zeros, invariants, partitioning invariance") {
    // group x: diffs {0, 0, +1, -1, +2} — zeros dropped but counted;
    // |d| ranks among nonzero: {1,1} tied at positions [1,2] (avg 1.5,
    // x2 = 3), {2} at position 3 (x2 = 6). W+x2 = 3 + 6 = 9 (the +1 and
    // +2), W-x2 = 3; tie_term = 2^3 - 2 = 6.
    // group y: diffs {+5, +5, -5} — one tied block [1,3] (avg 2, x2 =
    // 4): W+x2 = 2*4 = 8, W-x2 = 4, tie_term = 3^3 - 3 = 24.
    // group w: all zero — n_pairs 0, everything else 0 except n_zero.
    val df = (Seq(0L, 0L, 1L, -1L, 2L).map(("x", _)) ++
      Seq(5L, 5L, -5L).map(("y", _)) ++ Seq(("w", 0L))).toDF("g", "d")
    val got = Stats.wilcoxonSignedRank(df, "g", "d")
      .orderBy("g").as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("w", 0L, 1L, 0L, 0L, 0L),
      ("x", 3L, 2L, 9L, 3L, 6L), ("y", 3L, 0L, 8L, 4L, 24L)), s"$got")
    graft.operators.Materialize.sweep()
    val got2 = Stats.wilcoxonSignedRank(df.repartition(7), "g", "d")
      .orderBy("g").as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got2 == got, "partitioning must not move the statistic")
    graft.operators.Materialize.sweep()
    // null difference fails fast
    val nul = Seq(("a", Option(1L)), ("a", Option.empty[Long])).toDF("g", "d")
    val e = intercept[Exception](
      Stats.wilcoxonSignedRank(nul, "g", "d").collect())
    assert(e.getMessage.contains("null difference"))
    graft.operators.Materialize.sweep()
  }

  test("wilcoxonSignedRank matches a driver-side reference on random tied data; W+ + W- = n(n+1)") {
    // small value domain forces heavy ties AND zero diffs — the two
    // paths the x2 algebra has to get right
    val rnd = new scala.util.Random(42)
    val data = Seq.tabulate(300)(i =>
      (s"g${i % 3}", (rnd.nextInt(9) - 4).toLong))
    def ref(ds: Seq[Long]): (Long, Long, Long, Long, Long) = {
      val nz = ds.filter(_ != 0L)
      val sorted = nz.map(math.abs).sorted
      // avg-rank x2 per distinct |d|: positions are 1-based
      val rank2 = sorted.zipWithIndex.groupBy(_._1).map { case (a, ps) =>
        a -> (ps.map(_._2 + 1).min + ps.map(_._2 + 1).max).toLong
      }
      val wp = nz.filter(_ > 0).map(d => rank2(math.abs(d))).sum
      val wm = nz.filter(_ < 0).map(d => rank2(math.abs(d))).sum
      val tie = sorted.groupBy(identity).values
        .collect { case g if g.size > 1 =>
          g.size.toLong * g.size * g.size - g.size }.sum
      (nz.size.toLong, ds.count(_ == 0L).toLong, wp, wm, tie)
    }
    val got = Stats.wilcoxonSignedRank(data.toDF("g", "d"), "g", "d")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    val want = data.groupBy(_._1).map { case (g, rs) => g -> ref(rs.map(_._2)) }
    assert(got == want, s"got $got\nwant $want")
    // the closed-form invariant: ranks of the n nonzero diffs sum to
    // n(n+1)/2, so the x2 statistics sum to exactly n(n+1)
    got.values.foreach { case (n, _, wp, wm, _) =>
      assert(wp + wm == n * (n + 1), s"W+x2 $wp + W-x2 $wm != n(n+1)")
    }
    graft.operators.Materialize.sweep()
  }

  test("cvmTwoSample: hand-computed criterion, zero for identical samples, invariance, fail-fasts") {
    // a = {1,2,3}, b = {2,3,4,4}: cum_a = 1,2,3,3; cum_b = 0,1,2,4;
    // D = cuma·4 − cumb·3 = 4,5,6,0; c_v = 1,2,2,2 →
    // Σ c·D² = 16 + 50 + 72 + 0 = 138; T = 138/(3·4·7²) = 138/588 →
    // ×1e9 truncating = 234693877
    val df = Seq((0L, 1L), (0L, 2L), (0L, 3L),
      (1L, 2L), (1L, 3L), (1L, 4L), (1L, 4L)).toDF("side", "v")
    val r = Stats.cvmTwoSample(df, "side", "v")
      .as[(Long, Long, Long)].head()
    assert(r == ((3L, 4L, 234693877L)), s"$r")
    graft.operators.Materialize.sweep()
    val r2 = Stats.cvmTwoSample(df.repartition(5), "side", "v")
      .as[(Long, Long, Long)].head()
    assert(r2 == r, "partitioning must not move the criterion")
    graft.operators.Materialize.sweep()
    // identical samples: every gap is 0 → criterion exactly 0
    val same = Seq((0L, 7L), (0L, 9L), (1L, 7L), (1L, 9L)).toDF("side", "v")
    assert(Stats.cvmTwoSample(same, "side", "v")
      .as[(Long, Long, Long)].head()._3 == 0L)
    graft.operators.Materialize.sweep()
    // CvM sees what KS underweights: two equal-n samples interleaved
    // with a small persistent shift have a modest max gap but a large
    // integrated one — sanity: criterion strictly positive
    val shift = (1L to 50L).map((0L, _)) ++ (1L to 50L).map(x => (1L, x + 1))
    assert(Stats.cvmTwoSample(shift.toDF("side", "v"), "side", "v")
      .as[(Long, Long, Long)].head()._3 > 0L)
    graft.operators.Materialize.sweep()
    // fail-fasts shared with ksTwoSample: raw-value side domain,
    // null value, empty cohort
    val bad = Seq((0.9, 1L), (0.0, 2L)).toDF("side", "v")
    val e1 = intercept[Exception](Stats.cvmTwoSample(bad, "side", "v").collect())
    assert(e1.getMessage.contains("must be 0/1"))
    val oneSided = Seq((0L, 1L), (0L, 2L)).toDF("side", "v")
    val e2 = intercept[Exception](
      Stats.cvmTwoSample(oneSided, "side", "v").collect())
    assert(e2.getMessage.contains("cohort is empty"))
    graft.operators.Materialize.sweep()
  }

  test("kendallTauB: hand-computed P/Q/ties, tie-corrected tau, invariance, fail-fasts") {
    // perfect agreement: (1,1),(2,2),(3,3) → P=3, Q=0, no ties, τ=1
    val perfect = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("x", "y")
    val r1 = Stats.kendallTauB(perfect, "x", "y")
      .as[(Long, Long, Long, Long, Long, Double)].head()
    assert(r1 == ((3L, 3L, 0L, 0L, 0L, 1.0)), s"$r1")
    graft.operators.Materialize.sweep()
    // one discordant pair: (1,2),(2,1),(3,3) → P=2, Q=1, τ = 1/3
    val mixed = Seq((1L, 2L), (2L, 1L), (3L, 3L)).toDF("x", "y")
    val r2 = Stats.kendallTauB(mixed, "x", "y")
      .as[(Long, Long, Long, Long, Long, Double)].head()
    assert(r2._2 == 2L && r2._3 == 1L && r2._6 == 0.333333, s"$r2")
    graft.operators.Materialize.sweep()
    // tie correction: (1,1),(1,2),(2,2) → P=1, Q=0, Tx=1, Ty=1,
    // n0=3 → τ-b = 1/√((3−1)(3−1)) = 0.5
    val tied = Seq((1L, 1L), (1L, 2L), (2L, 2L)).toDF("x", "y")
    val r3 = Stats.kendallTauB(tied, "x", "y")
      .as[(Long, Long, Long, Long, Long, Double)].head()
    assert(r3 == ((3L, 1L, 0L, 1L, 1L, 0.5)), s"$r3")
    graft.operators.Materialize.sweep()
    // randomized reference cross-check over a heavily tied 5×5 domain
    val rnd = new scala.util.Random(11)
    val data = Seq.fill(200)((rnd.nextInt(5).toLong, rnd.nextInt(5).toLong))
    def refPQ(ds: Seq[(Long, Long)]): (Long, Long) = {
      var p = 0L; var q = 0L
      for (i <- ds.indices; j <- ds.indices if i < j) {
        val sx = (ds(j)._1 - ds(i)._1).sign
        val sy = (ds(j)._2 - ds(i)._2).sign
        if (sx * sy > 0) p += 1 else if (sx * sy < 0) q += 1
      }
      (p, q)
    }
    val (wp, wq) = refPQ(data)
    val r4 = Stats.kendallTauB(data.toDF("x", "y"), "x", "y")
      .as[(Long, Long, Long, Long, Long, Double)].head()
    assert(r4._2 == wp && r4._3 == wq, s"got $r4 want P=$wp Q=$wq")
    graft.operators.Materialize.sweep()
    val r5 = Stats.kendallTauB(data.toDF("x", "y").repartition(9), "x", "y")
      .as[(Long, Long, Long, Long, Long, Double)].head()
    assert(r5 == r4, "partitioning must not move the statistic")
    graft.operators.Materialize.sweep()
    // constant axis → τ undefined → fail fast
    val const = Seq((1L, 1L), (1L, 2L)).toDF("x", "y")
    val e1 = intercept[Exception](Stats.kendallTauB(const, "x", "y").collect())
    assert(e1.getMessage.contains("axis is constant"))
    graft.operators.Materialize.sweep()
    // null fails fast naming the column
    val nul = Seq((Option(1L), Option(1L)), (Option.empty[Long], Option(2L)))
      .toDF("x", "y")
    val e2 = intercept[Exception](Stats.kendallTauB(nul, "x", "y").collect())
    assert(e2.getMessage.contains("null value"))
    graft.operators.Materialize.sweep()
    // unbounded domain refused, not silently joined quadratically
    val wide = spark.range(5000).select(col("id").as("x"), col("id").as("y"))
    val e3 = intercept[IllegalArgumentException](
      Stats.kendallTauB(wide, "x", "y").collect())
    assert(e3.getMessage.contains("quantize"))
    graft.operators.Materialize.sweep()
  }

  test("ksTwoSample fail-fasts: bad side code, null value, empty cohort") {
    val bad = Seq((2L, 1L), (0L, 2L)).toDF("side", "v")
    val e1 = intercept[Exception](
      Stats.ksTwoSample(bad, "side", "v").collect())
    assert(e1.getMessage.contains("must be 0/1"))
    val nul = Seq((Option(0L), Option.empty[Long]),
      (Option(1L), Option(2L))).toDF("side", "v")
    val e2 = intercept[Exception](
      Stats.ksTwoSample(nul, "side", "v").collect())
    assert(e2.getMessage.contains("null value"))
    val oneSided = Seq((0L, 1L), (0L, 2L)).toDF("side", "v")
    val e3 = intercept[Exception](
      Stats.ksTwoSample(oneSided, "side", "v").collect())
    assert(e3.getMessage.contains("cohort is empty"))
    // a FRACTIONAL side in a double column must fail fast, not truncate
    // to 0 and silently misassign the row's cohort (the domain check
    // runs on the raw value, before any cast)
    val frac = Seq((0.9, 1L), (0.0, 2L), (1.0, 3L)).toDF("side", "v")
    val e4 = intercept[Exception](
      Stats.ksTwoSample(frac, "side", "v").collect())
    assert(e4.getMessage.contains("must be 0/1"))
    // exact 0.0/1.0 doubles remain valid side codes
    val okDouble = Seq((0.0, 1L), (1.0, 2L)).toDF("side", "v")
    assert(Stats.ksTwoSample(okDouble, "side", "v").count() == 1)
  }

  test("non-integral values fail fast across the whole family (round-15 advisory)") {
    // a bare cast("long") would truncate 3.5 → 3 and silently
    // misquantize the statistic — every value/difference column now
    // rides the shared integralOf fail-fast (the side-column hazard
    // class, closed for values too)
    val frac = Seq((0L, 1.5), (1L, 2.0)).toDF("side", "v")
    Seq[(String, org.apache.spark.sql.DataFrame => Any)](
      "ksTwoSample" -> (d => Stats.ksTwoSample(d, "side", "v").collect()),
      "cvmTwoSample" -> (d => Stats.cvmTwoSample(d, "side", "v").collect()),
      "adTwoSample" -> (d => Stats.adTwoSample(d, "side", "v").collect())
    ).foreach { case (name, run) =>
      val e = intercept[Exception](run(frac))
      assert(e.getMessage.contains("non-integral"), s"$name: ${e.getMessage}")
    }
    val fracPairs = Seq(("a", 1.5), ("a", 2.0)).toDF("g", "d")
    val e3 = intercept[Exception](
      Stats.wilcoxonSignedRank(fracPairs, "g", "d").collect())
    assert(e3.getMessage.contains("non-integral"))
    val e4 = intercept[Exception](
      Stats.madSummary(fracPairs, "g", "d").collect())
    assert(e4.getMessage.contains("non-integral"))
    val fracXy = Seq((1.5, 1L), (2.0, 2L)).toDF("x", "y")
    val e5 = intercept[Exception](
      Stats.kendallTauB(fracXy, "x", "y").collect())
    assert(e5.getMessage.contains("non-integral"))
    val e6 = intercept[Exception](
      Stats.theilSen(fracXy, "x", "y").collect())
    assert(e6.getMessage.contains("non-integral"))
    val e7 = intercept[Exception](
      Stats.jonckheereTerpstra(fracXy, "x", "y").collect())
    assert(e7.getMessage.contains("non-integral"))
    graft.operators.Materialize.sweep()
    // INTEGRAL doubles pass — the check is value-level, not type-level
    val intDouble = Seq((0L, 1.0), (0L, 2.0), (1L, 2.0), (1L, 3.0))
      .toDF("side", "v")
    assert(Stats.ksTwoSample(intDouble, "side", "v").count() == 1)
    graft.operators.Materialize.sweep()
  }

  test("adTwoSample: hand-computed tie-adjusted criterion, zero for identical samples, invariance, fail-fasts") {
    // a = {1,2,3}, b = {2,3,4,4} — the stat16 cohorts. Replaying the
    // Scholz–Stephens midrank formula in exact integers (×2 midranks,
    // ×4-cleared denominators, per-term ×10⁹ Euclidean-split floors)
    // gives 1658220210; the plain-float formula gives 1.65822021116 —
    // the two agree to the stated 1e-9 quantization, which pins BOTH
    // the algebra (the /2²-vs-/4 cancellation) and the floor contract.
    val df = Seq((0L, 1L), (0L, 2L), (0L, 3L),
      (1L, 2L), (1L, 3L), (1L, 4L), (1L, 4L)).toDF("side", "v")
    val r = Stats.adTwoSample(df, "side", "v")
      .as[(Long, Long, Long)].head()
    assert(r == ((3L, 4L, 1658220210L)), s"$r")
    graft.operators.Materialize.sweep()
    val r2 = Stats.adTwoSample(df.repartition(5), "side", "v")
      .as[(Long, Long, Long)].head()
    assert(r2 == r, "partitioning must not move the criterion")
    graft.operators.Materialize.sweep()
    // identical cohorts: every u = N·M2 − n·B2 is exactly 0 → AD = 0
    val same = Seq((0L, 7L), (0L, 9L), (1L, 7L), (1L, 9L)).toDF("side", "v")
    assert(Stats.adTwoSample(same, "side", "v")
      .as[(Long, Long, Long)].head()._3 == 0L)
    graft.operators.Materialize.sweep()
    // the tail-weighting claim: cohorts agreeing in the body where one
    // grows a far tail must register (strictly positive criterion)
    val tail = (1L to 40L).flatMap(x => Seq((0L, x), (1L, x))) ++
      (1L to 5L).map(i => (1L, 1000L + i))
    assert(Stats.adTwoSample(tail.toDF("side", "v"), "side", "v")
      .as[(Long, Long, Long)].head()._3 > 0L)
    graft.operators.Materialize.sweep()
    // fail-fasts: side domain, empty cohort, constant pooled sample
    val bad = Seq((2L, 1L), (0L, 2L)).toDF("side", "v")
    val e1 = intercept[Exception](Stats.adTwoSample(bad, "side", "v").collect())
    assert(e1.getMessage.contains("must be 0/1"))
    val oneSided = Seq((0L, 1L), (0L, 2L)).toDF("side", "v")
    val e2 = intercept[Exception](
      Stats.adTwoSample(oneSided, "side", "v").collect())
    assert(e2.getMessage.contains("cohort is empty"))
    val const = Seq((0L, 5L), (0L, 5L), (1L, 5L)).toDF("side", "v")
    val e3 = intercept[Exception](
      Stats.adTwoSample(const, "side", "v").collect())
    assert(e3.getMessage.contains("pooled sample is constant"))
    graft.operators.Materialize.sweep()
  }

  test("theilSen: hand-computed weighted medians, noiseless line, invariance, fail-fasts") {
    // cells (1,1)×1 (2,3)×2 (3,4)×1 (4,4)×1 → 9 weighted pairwise
    // slopes sorted 0.0(w1) 0.5(w2) 1.0(w3) 1.5(w1) 2.0(w2); rank
    // (9+1) DIV 2 = 5 lands in the 1.0 block → slope 1.0. Residuals
    // y − x: 0(w2) 1(w3); rank (5+1) DIV 2 = 3 → intercept 1.0.
    val df = Seq((1L, 1L), (2L, 3L), (2L, 3L), (3L, 4L), (4L, 4L))
      .toDF("x", "y")
    val r = Stats.theilSen(df, "x", "y")
      .as[(Long, Long, Double, Double)].head()
    assert(r == ((5L, 9L, 1.0, 1.0)), s"$r")
    graft.operators.Materialize.sweep()
    val r2 = Stats.theilSen(df.repartition(7), "x", "y")
      .as[(Long, Long, Double, Double)].head()
    assert(r2 == r, "partitioning must not move the medians")
    graft.operators.Materialize.sweep()
    // a noiseless planted line is recovered exactly: slope = median of
    // all-equal pairwise slopes, intercept = median of all-equal
    // residuals — and 29% gross corruption cannot move either median
    val line = (1L to 20L).map(x => (x, 3 * x - 7)) ++
      (1L to 5L).map(x => (x, 999L)) // 5/25 corrupt rows
    val r3 = Stats.theilSen(line.toDF("x", "y"), "x", "y")
      .as[(Long, Long, Double, Double)].head()
    assert(r3._3 == 3.0 && r3._4 == -7.0, s"robust line not recovered: $r3")
    graft.operators.Materialize.sweep()
    // fail-fasts: constant x, bounded-domain contract, null
    val constX = Seq((2L, 1L), (2L, 5L), (2L, 9L)).toDF("x", "y")
    val e1 = intercept[IllegalArgumentException](
      Stats.theilSen(constX, "x", "y").collect())
    assert(e1.getMessage.contains("x is constant"))
    val e2 = intercept[IllegalArgumentException](
      Stats.theilSen(df, "x", "y", maxCells = 3).collect())
    assert(e2.getMessage.contains("distinct (x, y) cells"))
    val nul = Seq((Option(1L), Option.empty[Long]),
      (Option(2L), Option(2L))).toDF("x", "y")
    val e3 = intercept[Exception](Stats.theilSen(nul, "x", "y").collect())
    assert(e3.getMessage.contains("null value"))
    graft.operators.Materialize.sweep()
  }

  test("jonckheereTerpstra: hand-computed counts, reversal antisymmetry, invariance, fail-fasts") {
    // g1: {1,2}, g2: {2,3}, g3: {3,3} — ordered cross pairs: lt = 9,
    // tie = 3 → J*×2 = 21; n = 6, Σnᵢ² = 12 → E[J*]×4 = 24;
    // trend×4 = 42 − 24 = 18 (increasing, as planted)
    val df = Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 3L), (3L, 3L))
      .toDF("g", "v")
    val r = Stats.jonckheereTerpstra(df, "g", "v")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(r == ((6L, 3L, 21L, 3L, 24L, 18L)), s"$r")
    graft.operators.Materialize.sweep()
    val r2 = Stats.jonckheereTerpstra(df.repartition(5), "g", "v")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(r2 == r, "partitioning must not move the counts")
    graft.operators.Materialize.sweep()
    // reversing the group order mirrors the trend exactly:
    // j_x2' = 2·gt + tie = 3, trend' = 6 − 24 = −18
    val rev = Stats.jonckheereTerpstra(
      df.select((lit(4L) - col("g")).as("g"), col("v")), "g", "v")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    // j_x2 + j_x2' = 2·(lt + gt + tie) = 2·cross-pairs = 24
    assert(rev._6 == -r._6 && rev._3 + r._3 == 2L * 12L,
      s"reversal not antisymmetric: $rev vs $r")
    graft.operators.Materialize.sweep()
    // fail-fasts: one group, bounded domain, null
    val one = Seq((5L, 1L), (5L, 2L)).toDF("g", "v")
    val e1 = intercept[IllegalArgumentException](
      Stats.jonckheereTerpstra(one, "g", "v").collect())
    assert(e1.getMessage.contains("single group"))
    val e2 = intercept[IllegalArgumentException](
      Stats.jonckheereTerpstra(df, "g", "v", maxCells = 3).collect())
    assert(e2.getMessage.contains("distinct (group, value) cells"))
    graft.operators.Materialize.sweep()
  }
}
