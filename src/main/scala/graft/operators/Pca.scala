package graft.operators

import graft.functions.GramAgg
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._

/** Principal-component extraction over an embedding column — the
  * dimensionality-reduction / whitening front door of an embedding
  * pipeline (project to the top direction(s) before clustering, probe
  * for a dominant nuisance axis, compress for ANN).
  *
  * Everything data-sized is EXACT fixed-point integers, so the result
  * is a pure function of the input multiset — partitioning, merge
  * order, and engine cannot move it, and a SQL oracle can replay it:
  *
  *  1. Gram pass: Σ ⌊scale·x⌋⌊scale·x⌋ᵀ via [[GramAgg]] — ONE
  *     distributed aggregate, d(d+1)/2 longs per partition shipped, no
  *     d²-row explosion, no float summation order anywhere.
  *  2. Normalize: cell-wise integer division by the row count (keeps
  *     later products inside int64 regardless of corpus size).
  *  3. Power iteration on the d×d long matrix — O(d²·iters) DRIVER
  *     work on ~32 KB of state for d = 64 (the data-sized reduction
  *     already happened; iterating driver-side is the same call the
  *     dedup union-find makes under its documented gate). Each step
  *     renormalizes to max-norm ~10⁶ by truncating integer division —
  *     all operations exact, so the iterate sequence is reproducible
  *     to the last bit.
  *  4. Deterministic sign: the first coordinate attaining max |v| is
  *     made positive (eigenvectors are sign-ambiguous; ties and signs
  *     must not depend on floating noise).
  *
  * The uncentered Gram direction (not mean-centered covariance) is
  * intentional: embedding corpora are ~centered by construction, and
  * uncentered keeps the pass single-shot; mean-center first with a
  * map-only `x − μ` if the application needs it.
  */
object Pca {

  /** (row-major d×d fixed-point Gram matrix, row count). */
  def gramMatrix(df: DataFrame, vecCol: String, dim: Int,
      scale: Int = 10000): (Array[Long], Long) = {
    val agg = GraftSqlBridge.column(
      GramAgg(GraftSqlBridge.expression(col(vecCol)), dim, scale)
        .toAggregateExpression())
    val row = df.filter(col(vecCol).isNotNull)
      .agg(agg.as("g"), count(lit(1)).as("n")).collect()(0)
    (row.getSeq[Long](0).toArray, row.getLong(1))
  }

  /** Top principal direction of the fixed-point Gram matrix, as
    * (dim, component) rows with components max-normalized to ~10⁶.
    */
  def topComponent(df: DataFrame, vecCol: String, dim: Int,
      scale: Int = 10000, iters: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (g, n) = gramMatrix(df, vecCol, dim, scale)
    if (n == 0L) return Seq.empty[(Int, Long)].toDF("dim", "component")
    val a = g.map(_ / n)
    var v = Array.fill(dim)(1000000L)
    var it = 0
    while (it < iters) {
      val w = new Array[Long](dim)
      var i = 0
      while (i < dim) {
        var s = 0L
        var j = 0
        while (j < dim) { s += a(i * dim + j) * v(j); j += 1 }
        w(i) = s
        i += 1
      }
      var m = 0L
      i = 0
      while (i < dim) { if (math.abs(w(i)) > m) m = math.abs(w(i)); i += 1 }
      val div = math.max(1L, m / 1000000L)
      i = 0
      while (i < dim) { v(i) = w(i) / div; i += 1 }
      it += 1
    }
    val maxAbs = v.map(math.abs).max
    val pivot = v(v.indexWhere(x => math.abs(x) == maxAbs))
    val sgn = if (pivot < 0) -1L else 1L
    v.indices.map(i => (i, v(i) * sgn)).toDF("dim", "component")
  }

  /** Per-row projection onto the corpus's top principal direction —
    * the "dominant-axis score" (rank docs along the main variance
    * direction, or subtract the axis to strip a nuisance signal).
    * proj = Σ ⌊scale·x_i⌋·v_i over the [[topComponent]] vector: exact
    * longs end to end (|q| ≤ scale·max|x|, |v| ≤ ~10⁶, d terms —
    * inside int64 headroom by orders of magnitude). The component rides
    * the plan as a literal array, so the projection pass is MAP-ONLY:
    * the d-long vector costs nothing to ship, nothing shuffles.
    */
  def projectTop(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      scale: Int = 10000, iters: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val comp = topComponent(df, vecCol, dim, scale, iters)
      .orderBy("dim").as[(Int, Long)].collect().map(_._2)
    if (comp.isEmpty) return Seq.empty[(Long, Long)].toDF(idCol, "proj")
    val vArr = array(comp.toIndexedSeq.map(lit): _*)
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol),
        aggregate(
          zip_with(col(vecCol).cast("array<double>"), vArr,
            (x, v) => floor(x * scale).cast("long") * v),
          lit(0L), (acc, t) => acc + t).as("proj"))
  }
}
