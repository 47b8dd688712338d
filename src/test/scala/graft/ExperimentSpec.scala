package graft

import graft.operators.Experiment
import org.apache.spark.sql.functions._

/** CUPED semantics: θ recovery against hand math, exact variance
  * elimination when the covariate explains the metric, unbiased variant
  * contrast, fail-fasts.
  */
class ExperimentSpec extends SparkSpec {

  import spark.implicits._

  test("cuped matches hand-computed θ/means and eliminates explained variance") {
    // x independent of variant (balanced by construction); y = 3x +
    // 10·variant: pooled θ = 3 exactly, the adjustment removes ALL
    // within-variant variance, and the adjusted contrast is the planted
    // effect 10
    val rows = for { i <- 0 until 400 } yield {
      val v = i % 2
      val x = ((i / 2) % 40).toDouble + 1.0
      (v.toLong, x, 3.0 * x + 10.0 * v)
    }
    val df = rows.toDF("variant", "x", "y").repartition(7)
    val out = Experiment.cuped(df, "variant", "y", "x")
      .orderBy("variant").collect()
    assert(out.length == 2)
    val xs = rows.map(_._2)
    val xbar = xs.sum / xs.size
    // hand θ: cov(x,y)/var(x) with y = 3x + 10v and cov(x,v) = 0 → 3
    val m0 = out(0); val m1 = out(1)
    assert(m0.getLong(1) == 200 && m1.getLong(1) == 200)
    // adjusted means: E[y] − θ(E[x|v] − x̄) = 3·x̄ + 10v (balanced x)
    assert(math.abs(m0.getDouble(3) - 3.0 * xbar) < 1e-9,
      s"control adjusted mean ${m0.getDouble(3)} != ${3.0 * xbar}")
    assert(math.abs(m1.getDouble(3) - (3.0 * xbar + 10.0)) < 1e-9)
    // the adjusted CONTRAST is the planted effect, exactly
    assert(math.abs((m1.getDouble(3) - m0.getDouble(3)) - 10.0) < 1e-9)
    // covariate explains all within-variant variance → reduction = 1
    assert(math.abs(m0.getDouble(4) - 1.0) < 1e-9, s"reduction ${m0.getDouble(4)}")
    assert(math.abs(m1.getDouble(4) - 1.0) < 1e-9)
    // raw means differ from adjusted only through the x imbalance term,
    // which is 0 here — raw contrast is ALSO 10 on balanced x
    assert(math.abs((m1.getDouble(2) - m0.getDouble(2)) - 10.0) < 1e-9)
  }

  test("cuped with an uninformative covariate leaves means intact and reduces nothing") {
    // y independent of x → θ ≈ 0 (exactly 0 here: y constant per parity
    // of x index? use y uncorrelated by construction: y cycles 0,1,2,3
    // against x cycling 0..7 over a full factorial — cov = 0 exactly)
    val rows = for { a <- 0 until 8; b <- 0 until 4; v <- 0 to 1 }
      yield (v.toLong, a.toDouble, b.toDouble * 2.0)
    val df = rows.toDF("variant", "x", "y")
    val out = Experiment.cuped(df, "variant", "y", "x")
      .orderBy("variant").collect()
    for (r <- out) {
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-12,
        "θ = 0 must leave means untouched")
      assert(math.abs(r.getDouble(4)) < 1e-12,
        s"no covariate signal → no reduction, got ${r.getDouble(4)}")
    }
  }

  test("srm: hand-computed chi-squared fixed point, balanced zero, null fail-fast") {
    // counts {30, 10}: chi2 = (2·(900+100) − 1600)/40 = 10 → 10_000_000
    val skewed = (Seq.fill(30)("a") ++ Seq.fill(10)("b")).toDF("variant")
    val r = Experiment.srm(skewed.repartition(5), "variant").collect()(0)
    assert(r.getLong(0) == 40L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 10000000L, s"srm ${r.getLong(2)}")
    // perfectly balanced → exactly 0
    val bal = (Seq.fill(25)("a") ++ Seq.fill(25)("b")).toDF("variant")
    assert(Experiment.srm(bal, "variant").collect()(0).getLong(2) == 0L)
    // null variant fails fast (it would form its own arm)
    val nulls = (Seq(Some("a"), None, Some("b"))).toDF("variant")
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + chain(t.getCause)
    val e = intercept[Exception](Experiment.srm(nulls, "variant").collect())
    assert(chain(e).contains("null variant"), chain(e))
  }

  test("cuped fail-fasts: constant covariate, nulls, empty") {
    val const = Seq((0L, 5.0, 1.0), (1L, 5.0, 2.0)).toDF("variant", "x", "y")
    val e1 = intercept[IllegalArgumentException](
      Experiment.cuped(const, "variant", "y", "x"))
    assert(e1.getMessage.contains("constant"))
    val nulls = Seq((Some(0L), Some(1.0), 1.0), (Some(1L), None, 2.0))
      .toDF("variant", "x", "y")
    val e2 = intercept[IllegalArgumentException](
      Experiment.cuped(nulls, "variant", "y", "x"))
    assert(e2.getMessage.contains("null"))
    val e3 = intercept[IllegalArgumentException](
      Experiment.cuped(const.filter(lit(false)), "variant", "y", "x"))
    assert(e3.getMessage.contains("empty"))
  }

  test("did: hand-computed four-cell readout, planted effect net of trend") {
    // control: 10 -> 16 (trend +6); treatment: 20 -> 31 (trend +6,
    // effect +5). Means exact: cells are (10,10), (16,16), (20,20),
    // (31,31) -> did = (31-20) - (16-10) = +5 (x1e6 = 5,000,000)
    val units = Seq(
      (0L, 0L, 10L), (0L, 0L, 10L), (0L, 1L, 16L), (0L, 1L, 16L),
      (1L, 0L, 20L), (1L, 0L, 20L), (1L, 1L, 31L), (1L, 1L, 31L)
    ).toDF("variant", "period", "m")
    val r = Experiment.did(units, "variant", "period", "m").collect()(0)
    assert((0 to 3).map(r.getLong) == Seq(2L, 2L, 2L, 2L))
    assert(r.getLong(4) == 20000000L && r.getLong(5) == 31000000L)
    assert(r.getLong(6) == 10000000L && r.getLong(7) == 16000000L)
    assert(r.getLong(8) == 5000000L)
    // partition invariance
    val r2 = Experiment.did(units.repartition(5), "variant", "period", "m")
      .collect()(0)
    assert(r2.getLong(8) == 5000000L)
  }

  test("did fail-fasts: empty cell, out-of-domain code, null metric") {
    val missing = Seq((0L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 3L))
      .toDF("variant", "period", "m") // no treatment-pre cell
    val e1 = intercept[Exception](
      Experiment.did(missing, "variant", "period", "m").collect())
    assert(e1.getMessage.contains("empty t_pre cell"))
    val bad = Seq((2L, 0L, 1L), (0L, 1L, 2L)).toDF("variant", "period", "m")
    val e2 = intercept[Exception](
      Experiment.did(bad, "variant", "period", "m").collect())
    assert(e2.getMessage.contains("must be 0/1"))
    val nul = Seq((Option(0L), 0L, Option.empty[Long]),
      (Option(1L), 1L, Option(3L))).toDF("variant", "period", "m")
    val e3 = intercept[Exception](
      Experiment.did(nul, "variant", "period", "m").collect())
    assert(e3.getMessage.contains("null metric"))
    // negative metric: the fixed-point means DIV only equals floor for
    // non-negative numerators — a refund-heavy cents column fails fast
    val neg = Seq((0L, 0L, 5L), (0L, 1L, -3L), (1L, 0L, 2L), (1L, 1L, 4L))
      .toDF("variant", "period", "m")
    val e4 = intercept[Exception](
      Experiment.did(neg, "variant", "period", "m").collect())
    assert(e4.getMessage.contains("negative metric") &&
      e4.getMessage.contains("-3"))
  }

  test("sprt: hand-computed crossings per arm, continue when undecided, partitioning invariance") {
    // p0=0.25 vs p1=0.75: wSucc = round(ln3*1e9) = 1098612289 = -wFail;
    // boundaries +/- round(ln19*1e9) = 2944438979. Three successes cross
    // the upper boundary at the 3rd observation (3*wSucc = 3295836867);
    // three failures mirror to accept_h0; strict alternation oscillates
    // +/- one increment and never decides.
    val (ws, wf, up, lo) = Experiment.sprtConstants(0.25, 0.75, 0.05, 0.05)
    assert(ws == 1098612289L && wf == -1098612289L)
    assert(up == 2944438979L && lo == -2944438979L)
    val rows =
      (1L to 4L).map(i => (0L, i, true)) ++
        (1L to 4L).map(i => (1L, i + 10, false)) ++
        (1L to 8L).map(i => (2L, i + 20, i % 2 == 1))
    val df = rows.toDF("arm", "ord", "big")
    val out = Experiment.sprt(df, "arm", "ord", col("big"), 0.25, 0.75)
      .orderBy("arm").collect()
    assert(out(0).getString(2) == "accept_h1" && out(0).getLong(3) == 3L &&
      out(0).getLong(4) == 3 * ws && out(0).getLong(1) == 4L)
    assert(out(1).getString(2) == "accept_h0" && out(1).getLong(3) == 13L &&
      out(1).getLong(4) == 3 * wf)
    assert(out(2).getString(2) == "continue" && out(2).isNullAt(3) &&
      out(2).isNullAt(4) && out(2).getLong(1) == 8L)
    val out2 = Experiment.sprt(df.repartition(7), "arm", "ord", col("big"),
      0.25, 0.75).orderBy("arm").collect()
    assert(out2.toSeq == out.toSeq, "partitioning must not move crossings")
  }

  test("sprt fail-fasts: hypothesis order, null arm, null success") {
    val df = Seq((0L, 1L, true)).toDF("arm", "ord", "big")
    val e1 = intercept[IllegalArgumentException](
      Experiment.sprt(df, "arm", "ord", col("big"), 0.6, 0.4))
    assert(e1.getMessage.contains("p0 < p1"))
    val nulArm = Seq((Option.empty[Long], 1L, true)).toDF("arm", "ord", "big")
    val e2 = intercept[Exception](
      Experiment.sprt(nulArm, "arm", "ord", col("big"), 0.25, 0.75).collect())
    assert(e2.getMessage.contains("null arm"))
    val nulBig = Seq((0L, 1L, Option.empty[Boolean])).toDF("arm", "ord", "big")
    val e3 = intercept[Exception](
      Experiment.sprt(nulBig, "arm", "ord", col("big"), 0.25, 0.75).collect())
    assert(e3.getMessage.contains("null success"))
  }

  test("bhFdr: hand-computed step-up boundary, tie-safe rejection, no-rejection case") {
    // m = 4, q = 0.25: sorted p x1e9 [1e7, 6e7, 2e8, 9e8] vs k·q/m =
    // k·6.25e7 — k=1 ok, k=2 ok, k=3 fails (2e8 > 1.875e8), k=4 fails
    // → k* = 2, threshold 6e7, exactly the two smallest rejected
    val df = Seq((10L, 200000000L), (11L, 10000000L),
      (12L, 900000000L), (13L, 60000000L)).toDF("id", "p")
    val got = Experiment.bhFdr(df, "id", "p", qX1e9 = 250000000L)
      .orderBy("id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq((10L, 200000000L, 3L, false), (11L, 10000000L, 1L, true),
      (12L, 900000000L, 4L, false), (13L, 60000000L, 2L, true)), s"$got")
    graft.operators.Materialize.sweep()
    // STEP-UP means a failing small k cannot veto: p = [5e7, 5e7, 5e7,
    // 9e8] at q = 0.1 — k=1 fails (2.5e7 < 5e7) but k=3 holds (7.5e7 ≥
    // 5e7) → all three tied values rejected TOGETHER (threshold
    // rejection, not rank rejection)
    val tied = Seq((1L, 50000000L), (2L, 50000000L), (3L, 50000000L),
      (4L, 900000000L)).toDF("id", "p")
    val got2 = Experiment.bhFdr(tied, "id", "p", qX1e9 = 100000000L)
      .orderBy("id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got2.map(_._4) == Seq(true, true, true, false), s"$got2")
    graft.operators.Materialize.sweep()
    // nothing satisfies the bound → zero rejections, every row present
    val none = Seq((1L, 800000000L), (2L, 900000000L)).toDF("id", "p")
    val got3 = Experiment.bhFdr(none, "id", "p", qX1e9 = 50000000L)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got3.length == 2 && got3.forall(!_._4))
    graft.operators.Materialize.sweep()
    // partitioning invariance — the rank path is the distributed
    // prefix-sum, not a single sort
    val rnd = new scala.util.Random(7)
    val big = Seq.tabulate(500)(i => (i.toLong, rnd.nextInt(1000000000).toLong))
    val a = Experiment.bhFdr(big.toDF("id", "p"), "id", "p")
      .orderBy("id").collect().toSeq
    graft.operators.Materialize.sweep()
    val b = Experiment.bhFdr(big.toDF("id", "p").repartition(13), "id", "p")
      .orderBy("id").collect().toSeq
    assert(a == b, "partitioning must not move the decision")
    graft.operators.Materialize.sweep()
    // out-of-domain p fails fast
    val bad = Seq((1L, 2000000000L)).toDF("id", "p")
    val e = intercept[Exception](Experiment.bhFdr(bad, "id", "p").collect())
    assert(e.getMessage.contains("x1e9 long in [0, 1e9]"))
    graft.operators.Materialize.sweep()
  }
}
