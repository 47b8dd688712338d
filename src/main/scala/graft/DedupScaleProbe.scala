package graft

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the dedup/sketch family: synthesizes a corpus two-plus
  * orders of magnitude above the bench documents table (5k rows at sf0.1)
  * with PLANTED near-duplicate groups, then drives the scale-path
  * operators end-to-end and reports wall-clock + result counts. Run:
  *   sbt "runMain graft.DedupScaleProbe 1000000"
  *
  * Corpus: docs come in groups of 5 sharing a 100-token template drawn
  * from a 5k-word vocabulary; ~5% of each doc's tokens are mutated
  * per-doc, so same-group pairs sit at Jaccard ≈ 0.8-0.9 and cross-group
  * pairs near 0. Everything is expression-generated (no driver loop, no
  * UDF) — the corpus materializes at scan speed on any cluster size.
  */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dedup-probe] $label%-38s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // group template token: word w<hash(group, i) % 5000>; per-doc
    // mutation replaces ~5% of positions with doc-unique words
    val docs: DataFrame = spark.range(nDocs)
      .select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(99)), i => {
          val group = expr("doc_id DIV 5") // integer division: `/` on longs is DOUBLE division
          val base = concat(lit("w"), pmod(xxhash64(group, i), lit(5000)))
          val mutated = concat(lit("m"), pmod(xxhash64(col("doc_id"), i, lit(1)), lit(100000)))
          when(pmod(xxhash64(col("doc_id"), i), lit(20)) === 0, mutated).otherwise(base)
        })).as("text"))

    val n = timed(s"generate+count ($nDocs docs)")(docs.count())
    require(n == nDocs)
    val mat = timed("materialize corpus to parquet") {
      docs.write.mode("overwrite").parquet("target/dedup_probe_corpus")
      spark.read.parquet("target/dedup_probe_corpus")
    }

    timed("exact fingerprint dedup") {
      val d = Dedup.exactByFingerprint(mat).count()
      println(s"[dedup-probe]   distinct fingerprints: $d")
    }
    timed("simhash signatures (map-only)") {
      Dedup.simhash(mat).write.mode("overwrite").parquet("target/dedup_probe_sims")
    }
    timed("minhash LSH near-dups (threshold 0.6)") {
      val pairs = Dedup.minhashNearDups(mat, shingleK = 3, numHashes = 16,
        bands = 4, threshold = 0.6).count()
      // each 5-doc group contributes up to C(5,2)=10 same-group pairs
      println(s"[dedup-probe]   near-dup pairs: $pairs (groups*10 = ${nDocs / 5 * 10})")
    }
    timed("winnowing fingerprint candidates") {
      val pairs = Dedup.winnowingNearDups(mat, k = 5, w = 4,
        minContainment = 0.6, maxDocFreq = 50).count()
      println(s"[dedup-probe]   winnowing pairs: $pairs")
    }
    spark.stop()
  }
}
