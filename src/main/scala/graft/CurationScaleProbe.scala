package graft

import graft.operators.Curation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end curation probe: the full [[Curation.curate]] pipeline
  * (quality → exact dedup → LSH near-dup clustering → decontamination →
  * mixture) over a 1M-doc synthetic corpus with planted duplicate
  * groups — the capstone "would this hold at scale" measurement: every
  * stage's row count plus total wall-clock. Run:
  *   sbt "runMain graft.CurationScaleProbe 1000000"
  *
  * The corpus mirrors DedupScaleProbe's 10%-dup regime (groups of 5
  * sharing a mutated template; realistic mostly-unique dedup load) with
  * a synthetic source column for the mixture stage. Language ID is
  * skipped: the synthetic vocabulary contains no natural-language
  * stopwords, so the stage would (correctly) drop everything.
  */
object CurationScaleProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.range(nDocs)
      .select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(99)), i => {
          val rawGroup = expr("doc_id DIV 5")
          val group = when(pmod(xxhash64(rawGroup, lit(7)), lit(100)) < 10, rawGroup)
            .otherwise(col("doc_id") + nDocs)
          val base = concat(lit("w"), pmod(xxhash64(group, i), lit(5000)))
          val mutated = concat(lit("m"), pmod(xxhash64(col("doc_id"), i, lit(1)), lit(100000)))
          when(pmod(xxhash64(col("doc_id"), i), lit(20)) === 0, mutated).otherwise(base)
        })).as("text"),
        concat(lit("src"), pmod(col("id"), lit(4)).cast("string")).as("source"))
    docs.write.mode("overwrite").parquet("target/curation_probe_corpus")
    val mat = spark.read.parquet("target/curation_probe_corpus")
    // benchmark = a disjoint synthetic eval set sharing some templates
    val bench = mat.filter(col("doc_id") % 211 === 0).select("doc_id", "text")

    val config = Curation.Config(
      languages = Set.empty, minTokens = 50, dedupExact = true,
      nearDupThreshold = Some(0.6),
      benchmark = Some(bench),
      contaminationK = 8,
      mixture = Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1))

    // the production shape: one lazy plan, one action
    val t0 = System.nanoTime()
    val n = Curation.curate(mat, config).count()
    val single = (System.nanoTime() - t0) / 1e9
    println(f"[curation-probe] single-pass curate ($nDocs docs -> $n rows): $single%.1f s")

    // the eager-audit shape: each stage count is an extra action that
    // re-evaluates its prefix of the pipeline — the lineage-report cost
    val audit = scala.collection.mutable.Buffer.empty[Curation.StageCount]
    val t1 = System.nanoTime()
    val n2 = Curation.curate(mat, config, audit = Some(audit)).count()
    val audited = (System.nanoTime() - t1) / 1e9
    audit.foreach(s => println(f"[curation-probe]   ${s.stage}%-14s ${s.rows}%9d rows"))
    println(f"[curation-probe]   final          $n2%9d rows")
    println(f"[curation-probe] eager-audited curate: $audited%.1f s")

    // the observed shape: the same counts collected DURING the single
    // action via Dataset.observe — audit at single-pass cost
    val t2 = System.nanoTime()
    val (outObs, stageCounts) = Curation.curateObserved(mat, config)
    val n3 = outObs.count()
    val observed = (System.nanoTime() - t2) / 1e9
    stageCounts().foreach(s =>
      println(f"[curation-probe]   ${s.stage}%-14s ${s.rows}%9d rows (observed)"))
    println(f"[curation-probe] observed-audit curate ($n3%d rows): $observed%.1f s")
    spark.stop()
  }
}
