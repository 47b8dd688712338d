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
    // mutation replaces ~5% of positions with doc-unique words.
    // dupPct controls how many 5-doc groups share a template (the rest
    // are unique docs) — 100 is the dup-dense worst case, 10 the
    // realistic mostly-unique dedup regime.
    def corpus(dupPct: Int): DataFrame = spark.range(nDocs)
      .select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(99)), i => {
          val rawGroup = expr("doc_id DIV 5") // integer division: `/` on longs is DOUBLE division
          // undup'd groups fall back to a per-doc template seed
          val group = when(pmod(xxhash64(rawGroup, lit(7)), lit(100)) < dupPct, rawGroup)
            .otherwise(col("doc_id") + nDocs)
          val base = concat(lit("w"), pmod(xxhash64(group, i), lit(5000)))
          val mutated = concat(lit("m"), pmod(xxhash64(col("doc_id"), i, lit(1)), lit(100000)))
          when(pmod(xxhash64(col("doc_id"), i), lit(20)) === 0, mutated).otherwise(base)
        })).as("text"))

    val docs = corpus(100)
    val n = timed(s"generate+count ($nDocs docs)")(docs.count())
    require(n == nDocs)
    val mat = timed("materialize corpus to parquet") {
      docs.write.mode("overwrite").parquet("target/dedup_probe_corpus")
      spark.read.parquet("target/dedup_probe_corpus")
    }
    val mat10 = timed("materialize 10%-dup corpus") {
      corpus(10).write.mode("overwrite").parquet("target/dedup_probe_corpus10")
      spark.read.parquet("target/dedup_probe_corpus10")
    }

    timed("exact fingerprint dedup") {
      val d = Dedup.exactByFingerprint(mat).count()
      println(s"[dedup-probe]   distinct fingerprints: $d")
    }
    timed("simhash signatures (map-only)") {
      Dedup.simhash(mat).write.mode("overwrite").parquet("target/dedup_probe_sims")
    }
    // Alternate the two pair strategies across repeated runs: JVM warm-up
    // and page-cache effects are larger than the strategy delta, so a
    // single-shot comparison flips between runs. Compare per-strategy MINs.
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "1").toInt
    for (rep <- 1 to reps;
         (label, m, selfJoin) <- Seq(
        ("dup-dense, group-pairs", mat, false), ("dup-dense, self-join", mat, true),
        ("10%-dup, group-pairs", mat10, false), ("10%-dup, self-join", mat10, true))) {
      timed(s"minhash LSH ($label) #$rep") {
        val pairs = Dedup.minhashNearDups(m, shingleK = 3, numHashes = 16,
          bands = 4, threshold = 0.6, selfJoinPairs = selfJoin).count()
        println(s"[dedup-probe]   near-dup pairs: $pairs")
      }
    }
    if (!sys.env.contains("SPARK_GRAFT_PROBE_SKIP_WINNOW")) {
      timed("winnowing (grouped pairs)") {
        val pairs = Dedup.winnowingNearDups(mat, k = 5, w = 4,
          minContainment = 0.6, maxDocFreq = 50).count()
        println(s"[dedup-probe]   winnowing pairs: $pairs")
      }
      timed("winnowing (grouped + scratch)") {
        val pairs = Dedup.winnowingNearDups(mat, k = 5, w = 4,
          minContainment = 0.6, maxDocFreq = 50,
          scratchDir = Some("target/dedup_probe_fps")).count()
        println(s"[dedup-probe]   winnowing pairs: $pairs")
      }
      timed("winnowing (self-join reference)") {
        val pairs = Dedup.winnowingNearDups(mat, k = 5, w = 4,
          minContainment = 0.6, maxDocFreq = 50, selfJoinPairs = true).count()
        println(s"[dedup-probe]   winnowing pairs: $pairs")
      }
    }
    spark.stop()
  }
}
