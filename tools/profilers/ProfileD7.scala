package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B probe for d7's winnowing grouped-relation pin (round 17,
  * VERDICT item 7). Run: sbt "runMain graft.ProfileD7" (set
  * SPARK_GRAFT_SF_DIR=target/scale10x for the 10x point).
  */
object ProfileD7 {
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

    def corpus: DataFrame = {
      val docs = graft.sources.Tables.load(spark, sfDir, "documents")
        .filter(col("doc_id") % 4 === 0).select("doc_id", "text")
      docs.unionByName(
        docs.select((col("doc_id") + 100000).as("doc_id"), col("text")))
    }

    // the registry d7 query (planted-pair left join), timed two ways:
    // count() (the bench's action) vs the noop sink (guide §1.4) — a
    // large gap means count() elides the cardinality-preserving left
    // join and with it the whole pair computation
    def d7q = {
      val docs = graft.sources.Tables.load(spark, sfDir, "documents")
        .filter(col("doc_id") % 4 === 0).select("doc_id", "text")
      val pairs = graft.operators.Dedup.winnowingNearDups(corpus, k = 5,
          w = 4, minContainment = 0.6, maxDocFreq = Int.MaxValue)
        .select(col("a_id"), col("b_id"), lit(true).as("found"))
      docs.select(col("doc_id").as("a_id"), (col("doc_id") + 100000).as("b_id"))
        .join(pairs, Seq("a_id", "b_id"), "left")
        .select(col("a_id"), col("b_id"),
          coalesce(col("found"), lit(false)).as("found"))
        .orderBy("a_id")
    }
    (1 to 2).foreach { r =>
      graft.operators.Materialize.sweep(); System.gc()
      val t0 = System.nanoTime()
      val n = d7q.count()
      println(f"d7 count() run $r: wall=${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
    }
    (1 to 2).foreach { r =>
      graft.operators.Materialize.sweep(); System.gc()
      val t0 = System.nanoTime()
      d7q.write.format("noop").mode("overwrite").save()
      println(f"d7 noop    run $r: wall=${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    for (pin <- Seq(false, true); r <- 1 to 3) {
      graft.operators.Materialize.sweep(); System.gc()
      val t0 = System.nanoTime()
      graft.operators.Dedup.winnowingNearDups(corpus, k = 5, w = 4,
          minContainment = 0.6, maxDocFreq = Int.MaxValue,
          pinGrouped = pin)
        .write.format("noop").mode("overwrite").save()
      println(f"pinGrouped=$pin run $r: wall=${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
