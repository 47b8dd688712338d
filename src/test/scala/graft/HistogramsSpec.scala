package graft

import graft.operators.{Histograms, Profile}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Equi-depth histograms (exact + t-digest boundaries) and the
  * approx-vs-exact agreement bounds that justify documenting the approx
  * paths as the at-scale defaults (VERDICT r4 §next-round 8).
  */
class HistogramsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("exact equi-depth on a uniform domain: perfectly equal buckets") {
    val df = (1 to 1000).map(_.toDouble).toDF("v")
    val h = Histograms.equiDepth(df, col("v"), buckets = 4, exact = true)
      .orderBy("bucket").collect()
    assert(h.map(_.getAs[Long]("bucket")).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(h.forall(_.getAs[Long]("n") == 250L))
    // buckets tile the domain: each lo is the previous hi's successor
    val bounds = h.map(r => (r.getAs[Double]("lo"), r.getAs[Double]("hi")))
    assert(bounds.sliding(2).forall { case Array(a, b) => b._1 == a._2 + 1 })
    assert(h.forall(r => math.abs(r.getAs[Double]("share") - 0.25) < 1e-12))
  }

  test("nulls are excluded, shares still sum to 1") {
    val df = ((1 to 100).map(i => Some(i.toDouble)) ++ Seq.fill(40)(Option.empty[Double]))
      .toDF("v")
    val h = Histograms.equiDepth(df, col("v"), buckets = 4, exact = true).collect()
    assert(h.map(_.getAs[Long]("n")).sum == 100L)
    assert(math.abs(h.map(_.getAs[Double]("share")).sum - 1.0) < 1e-12)
  }

  test("t-digest equi-depth agrees with exact on skewed data, under any partitioning") {
    // heavy right skew: v = u^4 over [0,1) — the regime where a naive
    // equi-width histogram collapses and boundary accuracy matters
    val df = spark.range(0, 20000)
      .select(pow(col("id").cast("double") / 20000.0, 4.0).as("v"))
    for (parts <- Seq(1, 13)) {
      val h = Histograms.equiDepth(df.repartition(parts), col("v"), buckets = 8)
        .orderBy("bucket").collect()
      assert(h.length == 8, s"parts=$parts: lost a bucket: ${h.toSeq}")
      val worst = h.map(r => math.abs(r.getAs[Double]("share") - 0.125)).max
      // two boundary rank errors at compression 100 stay well under 0.02
      assert(worst <= 0.02, s"parts=$parts: worst share deviation $worst")
    }
  }

  test("exact and t-digest boundaries agree to within the rank-error bound") {
    val df = spark.range(0, 20000)
      .select(pow(col("id").cast("double") / 20000.0, 4.0).as("v"))
    val ex = Histograms.equiDepth(df, col("v"), buckets = 8, exact = true)
      .orderBy("bucket").collect().map(r => r.getAs[Double]("hi"))
    val ap = Histograms.equiDepth(df, col("v"), buckets = 8)
      .orderBy("bucket").collect().map(r => r.getAs[Double]("hi"))
    // compare bucket upper edges by the RANK they cut, not by value:
    // a rank error eps moves the edge by at most the local quantile slope
    val sorted = df.orderBy("v").collect().map(_.getDouble(0))
    def rankOf(x: Double): Double = {
      val i = java.util.Arrays.binarySearch(sorted, x)
      (if (i >= 0) i else -i - 1).toDouble / sorted.length
    }
    ex.zip(ap).foreach { case (e, a) =>
      assert(math.abs(rankOf(e) - rankOf(a)) <= 0.01,
        s"edge rank drift: exact=$e approx=$a")
    }
  }

  test("exactQuantiles == Spark percentile bit-for-bit on adversarial shapes") {
    val ps = Seq(0.0, 0.125, 0.25, 0.5, 0.9, 0.99, 1.0)
    val shapes = Seq(
      // heavy duplication: one value holds >half the mass (a single bin
      // dominates; rank walking must cross a fat (value,count) entry)
      (1 to 1000).map(i => if (i <= 600) 42.0 else i.toDouble),
      // clustered: all mass in 2 tiny sub-ranges → almost every bin empty
      // (exercises the empty-bin skip in binOfRank)
      (1 to 500).map(_ * 1e-9) ++ (1 to 500).map(9e8 + _ * 1.0),
      // two values only
      Seq.fill(100)(1.0) ++ Seq.fill(300)(2.0),
      // negative + irrational spread
      (1 to 777).map(i => math.sin(i.toDouble) * 1000.0))
    shapes.zipWithIndex.foreach { case (vals, si) =>
      val df = vals.toDF("v").repartition(7)
      val expected = df.agg(expr(
        s"percentile(v, array(${ps.mkString("D,")}D))")).head().getSeq[Double](0)
      // small bin count forces multi-value bins and candidate walking
      val (got, n) = Histograms.exactQuantiles(df, col("v"), ps, bins = 16)
      assert(n == vals.size)
      expected.zip(got).zip(ps).foreach { case ((e, g), p) =>
        assert(java.lang.Double.doubleToLongBits(e) == java.lang.Double.doubleToLongBits(g),
          s"shape $si p=$p: percentile=$e exactQuantiles=$g")
      }
    }
  }

  test("exactQuantiles edges: empty input, single value, all-equal, nulls") {
    val empty = Seq.empty[Double].toDF("v")
    val (b0, n0) = Histograms.exactQuantiles(empty, col("v"), Seq(0.5))
    assert(n0 == 0 && b0.forall(_.isNaN))
    val one = Seq(7.0).toDF("v")
    assert(Histograms.exactQuantiles(one, col("v"), Seq(0.1, 0.9)) == (Seq(7.0, 7.0), 1L))
    val eq = Seq.fill(50)(3.25).toDF("v")
    assert(Histograms.exactQuantiles(eq, col("v"), Seq(0.5)) == (Seq(3.25), 50L))
    val withNulls = (Seq.fill(10)(Option.empty[Double]) ++ (1 to 9).map(i => Some(i.toDouble)))
      .toDF("v")
    val (b, n) = Histograms.exactQuantiles(withNulls, col("v"), Seq(0.5))
    assert(n == 9 && b == Seq(5.0))
  }

  test("exactQuantiles excludes NaNs like nulls: n and boundaries match the pre-filtered input") {
    val clean = (1 to 99).map(_.toDouble)
    val dirty = (clean.map(Some(_)) ++ Seq.fill(25)(Some(Double.NaN))
      ++ Seq.fill(10)(Option.empty[Double])).toDF("v")
    val (bd, nd) = Histograms.exactQuantiles(dirty, col("v"), Seq(0.25, 0.5, 0.75))
    val (bc, nc) = Histograms.exactQuantiles(clean.toDF("v"), col("v"), Seq(0.25, 0.5, 0.75))
    assert(nd == 99L && nd == nc)
    assert(bd.map(java.lang.Double.doubleToLongBits)
      == bc.map(java.lang.Double.doubleToLongBits))
    // and the histogram entry point inherits the exclusion — in BOTH
    // modes: unfiltered NaNs would pile into the t-digest branch's top
    // bucket (Spark orders NaN above every double) and the two modes
    // of the same API would disagree on identical data
    for (exact <- Seq(true, false)) {
      val h = Histograms.equiDepth(dirty, col("v"), buckets = 4,
        exact = exact).collect()
      assert(h.map(_.getAs[Long]("n")).sum == 99L,
        s"exact=$exact must exclude NaNs from every bucket")
      assert(math.abs(h.map(_.getAs[Double]("share")).sum - 1.0) < 1e-12)
      assert(h.map(_.getAs[Double]("hi")).forall(!_.isNaN),
        s"exact=$exact leaked a NaN into a bucket bound")
    }
  }

  test("subnormal-width domain (hi-lo underflows per-bin): still exact, no pass disagreement") {
    // lo=0, hi=400*MIN_VALUE: (hi-lo)/8192 rounds to 0.0 — the regime
    // where pass 2's width==0 guard (all rows → bin 0) must be mirrored
    // by the candidate filter or pass 3 throws IllegalStateException
    val mv = java.lang.Double.MIN_VALUE
    val vals = (0 until 401).map(i => i * mv) // exact: subnormal ulp steps
    val (b, n) = Histograms.exactQuantiles(vals.toDF("v"), col("v"), Seq(0.0, 0.5, 1.0))
    assert(n == 401L)
    assert(b.map(java.lang.Double.doubleToLongBits)
      == Seq(0.0, 200 * mv, 400 * mv).map(java.lang.Double.doubleToLongBits))
  }

  test("profile approxDistinct stays within the HLL error envelope of exact") {
    val df = spark.range(0, 50000).select(
      col("id").as("hi_card"),
      (col("id") % 37).as("lo_card"),
      concat(lit("u"), (col("id") % 9311)).as("str_card"))
    val exact = Profile.profile(df).collect()
      .map(r => r.getAs[String]("col_name") -> r.getAs[Long]("n_distinct")).toMap
    val approx = Profile.profile(df, approxDistinct = true).collect()
      .map(r => r.getAs[String]("col_name") -> r.getAs[Long]("n_distinct")).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (c, nd) =>
      val a = approx(c)
      // approx_count_distinct default rsd = 5%; 3 sigma envelope
      assert(math.abs(a - nd).toDouble <= math.max(1.0, 0.15 * nd),
        s"col $c: exact=$nd approx=$a outside 15% envelope")
    }
  }
}
