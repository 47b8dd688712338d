package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B probe for ml13's boosting loop (round 17): how much of
  * the wall is whole-stage-codegen recompilation per round? Variants:
  *   A current (codegen on)
  *   B wholeStage=false scoped to the fit
  *   C B + factoryMode=NO_CODEGEN (fully interpreted expressions)
  * Run: sbt "runMain graft.ProfileMl13" (SPARK_GRAFT_SF_DIR to switch SF)
  */
object ProfileMl13 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    BenchKit.warmFiles(new java.io.File(sfDir))

    def train = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        expr("CAST(n_chars DIV 10 AS DOUBLE)").as("f_cb"),
        expr("CAST(doc_id % 7 AS DOUBLE)").as("f_mod"))
      .withColumn("y", lit(2.0)
        + when(col("f_cb") > 30.0, 8.0).otherwise(0.0)
        + when(col("f_mod") > 3.0, 3.0).otherwise(0.0))

    def fit(maxRounds: Int = 60): Int = graft.operators.Trainer.boostStumps(
      train, Seq("f_cb", "f_mod"), "y", rounds = maxRounds).roundsRun

    def scoped[T](kvs: (String, String)*)(body: => T): T = {
      val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }

    def time(name: String)(body: => Int): Unit =
      (1 to 3).foreach { r =>
        graft.operators.Materialize.sweep(); System.gc()
        val t0 = System.nanoTime()
        val rounds = body
        println(f"$name run $r: wall=${(System.nanoTime() - t0) / 1e9}%.3f s roundsRun=$rounds")
      }

    // bare-round anatomy: the same 2·64-term agg over a fixed pin,
    // repeated — isolates per-round driver/analysis/job cost from the
    // loop's own plan growth
    locally {
      val d = 2; val bins = 64
      val data = train.select(
        (col("y") - lit(5.0)).as("__r"),
        (col("f_cb") % bins).cast("int").as("__b0"),
        (col("f_mod") % bins).cast("int").as("__b1"))
      val pin = graft.operators.Materialize(data)
      (1 to 6).foreach { k =>
        val t0 = System.nanoTime()
        val sumArr = array((for (i <- 0 until d; b <- 0 until bins) yield
          sum(when(col(s"__b$i") === b, col("__r")).otherwise(0.0))): _*).as("s")
        pin.agg(sumArr).collect()
        println(f"bare agg round $k: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      (1 to 3).foreach { k =>
        val t0 = System.nanoTime()
        val p2 = graft.operators.Materialize(pin.select(
          (col("__r") - lit(0.001)).as("__r"), col("__b0"), col("__b1")))
        graft.operators.Materialize.releaseSuperseded(p2)
        println(f"bare pin round $k: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      graft.operators.Materialize.releaseSuperseded(pin)
    }
    time("A codegen-on     ")(fit())
    time("A1 one-round     ")(fit(1))
    time("B wholestage-off ")(scoped(
      "spark.sql.codegen.wholeStage" -> "false")(fit()))
    time("C interpreted    ")(scoped(
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")(fit()))
    spark.stop()
  }
}
