package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch probe: ml11's per-group IRLS round counts at sf0.1. */
object ProfileMl11 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val words = expr("length(text) - length(replace(text, ' ', '')) + 1")
    val slope = lit(4.0) + expr("CAST(substring(source, 4) AS BIGINT) % 4").cast("double")
    val z = col("n_chars").cast("double") - slope * words.cast("double")
    val train = docs.filter(abs(z) > 5.0)
      .select(col("doc_id"), col("source"),
        col("n_chars").cast("double").as("f_chars"),
        words.cast("double").as("f_words"),
        when(z > 0, 1.0).otherwise(0.0).as("y"))
    println("train rows = " + train.count())
    for (round <- 1 to 3; (aqe, parts) <- Seq(("true", "32"), ("false", "32"), ("false", "1"), ("false", "4"))) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      graft.operators.Materialize.sweep(); System.gc()
      val t0 = System.nanoTime()
      val model = graft.operators.Trainer.logisticFitPerGroup(train,
        "source", Seq("f_chars", "f_words"), "y", iters = 40, l2 = 1e-7)
      model.count()
      println(f"round $round aqe=$aqe parts=$parts fit wall ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
