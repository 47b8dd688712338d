package graft

import graft.queries.ExtendedQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The stat5/stat8 exact-arithmetic contract (ADVICE r9 medium): the
  * per-cell chi-squared term floor((N·o − r·c)²·10⁶ / (N·r·c)) is
  * DECIMAL(38,0)-exact for every valid contingency cell with
  * N < ChiSquareNMax = 2·10⁸ (|N·o − r·c| ≤ N²/4 for valid cells, so
  * the numerator tops out at N⁴·10⁶/16 — exactly 10³⁸ at the bound),
  * and FAILS FAST past it instead of ANSI-off's silent NULL-then-drop
  * inside `sum` (which would emit a wrong chi-squared, not an error).
  */
class ChiSquareBoundSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val NMax = ExtendedQueries.ChiSquareNMax

  /** BigInt ground truth of the per-cell term (floor division —
    * n, r, c positive, so SQL `div` and BigInt `/` agree on sign).
    */
  private def truth(n: Long, r: Long, c: Long, o: Long): BigInt = {
    val d = BigInt(n) * o - BigInt(r) * c
    (d * d * 1000000) / (BigInt(n) * r * c)
  }

  private def sparkTerm(n: Long, r: Long, c: Long, o: Long): Option[BigInt] = {
    val row = Seq((n, r, c, o)).toDF("n", "r", "c", "o")
      .select(expr(ExtendedQueries.chiCellTerm).as("term")).head()
    if (row.isNullAt(0)) None else Some(BigInt(row.getDecimal(0).toBigInteger))
  }

  test("worst-case cells at N = NMax - 1 evaluate exactly (no overflow, no null)") {
    val n = NMax - 1          // 199 999 999
    val half = n / 2          // 99 999 999
    // positive-d worst case: o = r = c = ⌊N/2⌋ → d = r(N − c) ≈ N²/4
    // (the supremum of N·o − r·c over valid cells, per the bound proof)
    val worstPos = Seq((n, half, half, half),
      // negative-d worst case: o = 0 with r + c ≤ N → d = −r·c ≈ −N²/4
      (n, half, half, 0L),
      // asymmetric margins near the edge
      (n, n - 1, half, half), (n, 1L, n - 1, 1L))
    worstPos.foreach { case (nn, r, c, o) =>
      val got = sparkTerm(nn, r, c, o)
      assert(got.contains(truth(nn, r, c, o)),
        s"(n=$nn r=$r c=$c o=$o): spark=$got truth=${truth(nn, r, c, o)}")
    }
    // sanity: the positive worst case really is within a hair of 10³⁸
    val d = BigInt(n) * half - BigInt(half) * half
    assert(d * d * 1000000 > BigInt(10).pow(37),
      "the engineered case must actually exercise the top decimal digit")
  }

  test("the guard fires at N = NMax instead of silently nulling the cell") {
    val e = intercept[Exception] {
      sparkTerm(NMax, NMax / 2, NMax / 2, NMax / 2)
    }
    assert(e.getMessage.contains("chi-squared grid"),
      s"expected the documented fail-fast message, got: ${e.getMessage}")
  }

  test("below the bound the guarded term matches the unguarded oracle arithmetic on a dense grid") {
    // a spread of valid (margin-consistent) cells from a real table:
    // 3 langs × 4 sources over 10k rows, cells from the actual counts
    val df = spark.range(0, 10000).select(
      (col("id") % 3).cast("string").as("lang"),
      (col("id") % 7 % 4).cast("string").as("source"))
    val cells = df.groupBy("lang", "source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val rT = df.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cT = df.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (l <- rT.keys; s <- cT.keys) {
      val o = cells.getOrElse((l, s), 0L)
      val got = sparkTerm(10000L, rT(l), cT(s), o)
      assert(got.contains(truth(10000L, rT(l), cT(s), o)),
        s"cell ($l,$s): spark=$got truth=${truth(10000L, rT(l), cT(s), o)}")
    }
  }
}
