package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: JIT + codegen + parquet-reader init on the smallest SF, so
    // whichever query happens to run first isn't charged session startup.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // IO warmup: fault every input byte into the page cache BEFORE any
    // timing (this VM's cold reads jitter 2-5x run-to-run, which used to
    // dominate cross-round comparisons). A Spark count() won't do it —
    // parquet count reads only row-group metadata — so stream the raw
    // files. Deterministic: no seed, no sampling, every byte exactly once.
    def warmFiles(f: java.io.File): Unit =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(warmFiles)
      else if (f.getName.endsWith(".parquet")) {
        val in = new java.io.FileInputStream(f)
        val buf = new Array[Byte](1 << 20)
        try while (in.read(buf) >= 0) () finally in.close()
      }
    warmFiles(new java.io.File(sfDir))
    // Best-of-N per query (default 2): the first run pays page-cache and
    // codegen warmup; the min reflects steady-state engine cost.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        // A crashing query reports -1, never its elapsed-to-crash time —
        // failures must be distinguishable from fast passes in BENCH output.
        // GC between queries so a query is never charged the allocation
        // debt (dead broadcasts, codegen classes, agg buffers) of the 50+
        // queries before it — without this, late-running queries measure
        // the session's garbage, not their own cost.
        System.gc()
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
          if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        }
        name -> (if (times.contains(-1.0)) -1.0 else times.min)
      }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val failed = results.count(_._2 < 0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
