package graft

import graft.operators.{Materialize, Rank}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch step-timer for stat13_mad_outliers (madSummary internals).
  * Not part of the engine; run manually. */
object ProfileStat13 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    BenchKit.warmFiles(new java.io.File(sfDir))
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(18,2)")
    (1 to 3).foreach { round =>
      println(s"-- round $round --")
      Materialize.sweep(); System.gc()
      val t0 = System.nanoTime()
      val rows = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_returnflag").as("__grp"),
          (dec(col("l_extendedprice")) * 100).cast("long").as("__v"))
      val cnt = time("cnt pin") { Materialize(
        rows.groupBy("__grp", "__v").agg(count(lit(1)).as("__c"))) }
      val tot = time("tot local") { Materialize.local(
        rows.groupBy("__grp").agg(count(lit(1)).as("n"))) }
      time("  sub: approxQuantile") {
        cnt.stat.approxQuantile("__v", (1 until 32).map(_.toDouble / 32).toArray, 0.01) }
      time("  sub: stats collect") {
        cnt.withColumn("__g", lit(0))
          .groupBy("__grp", "__g")
          .agg(sum(col("__c").cast("long")).as("s"), count(lit(1)).as("n"),
            count_distinct(col("__v")).as("nd")).collect() }
      val rm = time("rm globalRunningSum") {
        Rank.globalRunningSum(cnt, "__v", "__c", outCol = "__cum",
          seriesCols = Seq("__grp")) }
      val med = time("med local") { Materialize.local(
        rm.join(broadcast(tot), "__grp")
          .filter(col("__cum") >= expr("(n + 1) DIV 2"))
          .groupBy("__grp").agg(min(col("__v")).as("__med"))) }
      val devCnt = time("devCnt pin") { Materialize(
        cnt.join(broadcast(med), "__grp")
          .groupBy(col("__grp"), abs(col("__v") - col("__med")).as("__d"))
          .agg(sum(col("__c")).as("__c"))) }
      val rm2 = time("rm2 globalRunningSum") {
        Rank.globalRunningSum(devCnt, "__d", "__c", outCol = "__cum",
          seriesCols = Seq("__grp")) }
      val mad = time("mad local") { Materialize.local(
        rm2.join(broadcast(tot), "__grp")
          .filter(col("__cum") >= expr("(n + 1) DIV 2"))
          .groupBy("__grp").agg(min(col("__d")).as("__mad"))) }
      val outliers = devCnt.join(broadcast(mad), "__grp")
        .filter(col("__d") > lit(5L) * col("__mad"))
        .groupBy("__grp").agg(sum(col("__c")).as("__out"))
      time("final join+count") {
        tot.join(broadcast(med), "__grp")
          .join(broadcast(mad), "__grp")
          .join(broadcast(outliers), Seq("__grp"), "left")
          .select(col("__grp"), col("n"), col("__med"), col("__mad"),
            coalesce(col("__out"), lit(0L)).as("outliers_n"))
          .orderBy("__grp").count() }
      println(f"  TOTAL ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
