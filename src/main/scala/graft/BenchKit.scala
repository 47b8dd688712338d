package graft

import org.apache.spark.sql.SparkSession

/** Shared measurement plumbing for the timing mains ([[Bench]], the
  * 10× [[ScaleCurve]]): locale-pinned JSON number formatting, the
  * page-cache pre-fault, and the contention sentinel. One definition —
  * the two harnesses must agree on what "idle machine" and "steady
  * state" mean or their numbers aren't comparable.
  */
private[graft] object BenchKit {

  /** Locale-pinned fixed-point formatter for the JSON artifacts: the
    * f-interpolator uses the JVM default locale, and a comma-decimal
    * default (de_DE, fr_FR, …) would emit `97,8` — invalid JSON — into
    * the committed records. Every numeric field goes through this.
    */
  def jn(x: Double, prec: Int): String =
    String.format(java.util.Locale.ROOT, "%." + prec + "f", Double.box(x))

  /** Fault every input byte into the page cache BEFORE any timing
    * (this VM's cold reads jitter 2-5x run-to-run, which used to
    * dominate cross-round comparisons). A Spark count() won't do it —
    * parquet count reads only row-group metadata — so stream the raw
    * files. Deterministic: no seed, no sampling, every byte exactly once.
    */
  def warmFiles(f: java.io.File): Unit =
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(warmFiles)
    else if (f.getName.endsWith(".parquet")) {
      val in = new java.io.FileInputStream(f)
      val buf = new Array[Byte](1 << 20)
      try while (in.read(buf) >= 0) () finally in.close()
    }

  /** Contention sentinel: a fixed pure-CPU probe (no IO, no shuffle-size
    * dependence) re-timed across the sweep. On an otherwise-idle machine
    * repeated readings agree within noise; a concurrent build/test run
    * inflates whichever ones it overlaps, so a contaminated run is
    * VISIBLY contaminated in its own JSON record (spread = max/min;
    * treat > ~1.5 as "re-run exclusively"). Best-of-3 damps one-off
    * JIT/GC/scheduler blips: a reading only inflates under SUSTAINED
    * external load, which is the signal.
    */
  def sentinel(spark: SparkSession): Double = {
    System.gc()
    (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(0, 400000000L, 1, spark.sparkContext.defaultParallelism)
        .selectExpr("sum(id * 3 + 1)").collect()
      (System.nanoTime() - t0) / 1e9
    }.min
  }

  /** JIT the probe itself before the first timed reading. A fixed
    * two-call warm-up was NOT enough: C2 compilation of the range/sum
    * codegen kept inflating the third reading ~1.8× on an idle machine
    * (observed twice across rounds), so the start probe false-flagged
    * every clean run. Warm until two consecutive readings agree within
    * 10% (bounded — on a genuinely loaded machine convergence may never
    * come, and then the inflated start reading is exactly the signal
    * the sentinel exists to emit).
    */
  def warmedSentinel(spark: SparkSession): Double = {
    var prev = sentinel(spark)
    var cur = sentinel(spark)
    var tries = 0
    while (tries < 8 && math.abs(cur - prev) > 0.10 * math.min(cur, prev)) {
      prev = cur; cur = sentinel(spark); tries += 1
    }
    cur
  }
}
