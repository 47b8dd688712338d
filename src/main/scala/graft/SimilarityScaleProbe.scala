package graft

import graft.operators.Similarity
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the similarity-search family: synthesizes a clustered
  * embedding corpus (~500× the bench embeddings table), then compares the
  * brute-force baseline against the IVF path at a realistic index shape
  * (√n centroids) and reports wall-clock + recall. Run:
  *   sbt "runMain graft.SimilarityScaleProbe 1000000"
  *
  * Corpus: 1000-vector clusters; each dimension is 90% cluster centroid +
  * 10% per-vector noise, hash-derived (deterministic, expression-only).
  */
object SimilarityScaleProbe {
  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val dims = 64
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sim-probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    def u(seed: Column, d: Column, salt: Int): Column =
      pmod(xxhash64(seed, d, lit(salt)), lit(2001L)).cast("double") / 1000.0 - 1.0

    val corpus: DataFrame = spark.range(nVecs)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dims - 1)), d =>
          (u(expr("id DIV 1000"), d, 1) * 0.9 + u(col("id"), d, 2) * 0.1).cast("float"))
          .as("embedding"))

    timed(s"materialize corpus ($nVecs × $dims)") {
      corpus.write.mode("overwrite").parquet("target/sim_probe_corpus")
    }
    val mat = spark.read.parquet("target/sim_probe_corpus")
    val queries = mat.filter(col("vec_id") % 100000 === 7) // ~n/1e5 probes

    val brute = timed("brute-force knn (k=10)") {
      val r = Similarity.bruteForceKnn(mat, queries, k = 10)
        .select("query_id", "neighbor_id").collect()
      r.map(row => (row.getLong(0), row.getLong(1))).toSet
    }
    val nc = math.max(16, math.sqrt(nVecs.toDouble).toInt)
    // one-time index build (amortized over every future query batch);
    // written partitionBy(cell) so probed-cell pruning is PHYSICAL
    val index = timed(s"ivf index build ($nc centroids, map-only, cell-partitioned)") {
      val ix = Similarity.ivfIndex(mat, nc)
      // repartition on the partition column first: otherwise every task
      // writes a sliver of every cell — tasks × cells small files
      ix.assigned.repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell")
        .parquet("target/sim_probe_index")
      ix
    }
    val served = index.copy(assigned = spark.read.parquet("target/sim_probe_index"))
    val ivf = timed("ivf query batch (nprobe=32, k=10)") {
      val r = Similarity.ivfQuery(served, queries, k = 10, nprobe = 32)
        .select("query_id", "neighbor_id").collect()
      r.map(row => (row.getLong(0), row.getLong(1))).toSet
    }
    val recall = (brute & ivf).size.toDouble / brute.size
    println(f"[sim-probe] recall@10 vs brute force: $recall%.3f (${(brute & ivf).size}/${brute.size})")
    spark.stop()
  }
}
