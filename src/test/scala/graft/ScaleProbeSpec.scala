package graft

import graft.operators.{Curation, Dedup, Graph, Similarity}
import graft.sources.{IO, Lakehouse, Layout, SkipIndex}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.Tag

/** Opt-in (`-n Slow`) tag: these probes generate 10⁵–10⁶-row corpora and
  * take minutes on the local[4] test session — excluded from plain
  * `sbt test`, run per-round via `sbt "testOnly *ScaleProbeSpec* -- -n Slow"`.
  */
object Slow extends Tag("Slow")

/** The scale probes' counts, promoted from printed diagnostics to
  * asserted regression gates. The standalone `*ScaleProbe` mains remain
  * the full-size wall-clock instruments; this spec drives the SAME
  * deterministic generators at a reduced-but-still-2-orders-above-bench
  * size and asserts the COUNTS (never the seconds), so silent semantic
  * drift in the scale paths — a changed hash, a lost pair strategy, an
  * audit miscount — fails a test instead of quietly shifting a printed
  * number nobody diffs.
  *
  * Two kinds of assertion:
  *  - EQUIVALENCES that must hold at any size (group-pairs == self-join,
  *    oriented == naive triangle count, single-pass == eager-audit ==
  *    observed curation counts, index-pruned scan == full scan+filter);
  *  - PINNED EXACT COUNTS for the fixed spec sizes (every generator is
  *    xxhash64-derived — bit-stable across runs, partitionings, and
  *    rounds).
  */
class ScaleProbeSpec extends SparkSpec {

  import spark.implicits._

  // --- DedupScaleProbe's corpus (groups of 5 sharing a mutated template) ---
  private def dedupCorpus(nDocs: Long, dupPct: Int): DataFrame = spark.range(nDocs)
    .select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(99)), i => {
        val rawGroup = expr("doc_id DIV 5")
        val group = when(pmod(xxhash64(rawGroup, lit(7)), lit(100)) < dupPct, rawGroup)
          .otherwise(col("doc_id") + nDocs)
        val base = concat(lit("w"), pmod(xxhash64(group, i), lit(5000)))
        val mutated = concat(lit("m"), pmod(xxhash64(col("doc_id"), i, lit(1)), lit(100000)))
        when(pmod(xxhash64(col("doc_id"), i), lit(20)) === 0, mutated).otherwise(base)
      })).as("text"))

  private val nDedupDocs = 100000L

  test("dedup probe: exact fingerprints and LSH/winnowing strategy equivalence", Slow) {
    dedupCorpus(nDedupDocs, dupPct = 100).write.mode("overwrite")
      .parquet("target/probe_spec_dedup")
    val mat = spark.read.parquet("target/probe_spec_dedup")

    // NOT 100000: P(a doc takes zero of its ~5% mutations) = (19/20)^100
    // ≈ 0.6%, so a few same-group doc pairs collide to identical text —
    // 7 of them at this size, pinned (the generator is xxhash64-pure).
    val distinctFp = Dedup.exactByFingerprint(mat).count()
    println(s"[probe-spec] dedup distinct fingerprints: $distinctFp")
    assert(distinctFp == 99993L, "exact-dup structure of the planted corpus drifted")

    val grouped = Dedup.minhashNearDups(mat, shingleK = 3, numHashes = 16,
      bands = 4, threshold = 0.6).count()
    val selfJoin = Dedup.minhashNearDups(mat, shingleK = 3, numHashes = 16,
      bands = 4, threshold = 0.6, selfJoinPairs = true).count()
    println(s"[probe-spec] minhash pairs grouped=$grouped selfJoin=$selfJoin")
    assert(grouped == selfJoin, "pair strategies must agree")

    val wGrouped = Dedup.winnowingNearDups(mat, k = 5, w = 4,
      minContainment = 0.6, maxDocFreq = 50).count()
    val wScratch = Dedup.winnowingNearDups(mat, k = 5, w = 4,
      minContainment = 0.6, maxDocFreq = 50,
      scratchDir = Some("target/probe_spec_fps")).count()
    val wSelfJoin = Dedup.winnowingNearDups(mat, k = 5, w = 4,
      minContainment = 0.6, maxDocFreq = 50, selfJoinPairs = true).count()
    println(s"[probe-spec] winnowing pairs grouped=$wGrouped scratch=$wScratch selfJoin=$wSelfJoin")
    assert(wGrouped == wScratch && wGrouped == wSelfJoin,
      "winnowing formulations must agree")
  }

  // --- GraphScaleProbe's graphs (uniform + celebrity-core skew) ---
  private val nEdges = 300000L

  test("graph probe: oriented triangle count equals naive, skew completes", Slow) {
    val nVerts = nEdges / 10
    val uniform = spark.range(nEdges).select(
      pmod(xxhash64(col("id"), lit(1)), lit(nVerts)).as("u"),
      pmod(xxhash64(col("id"), lit(2)), lit(nVerts)).as("v"))
    val skewed = spark.range(nEdges).select(
      when(pmod(xxhash64(col("id"), lit(3)), lit(10)) < 9,
        pmod(xxhash64(col("id"), lit(4)), lit(1000)))
        .otherwise(pmod(xxhash64(col("id"), lit(5)), lit(nVerts))).as("u"),
      pmod(xxhash64(col("id"), lit(6)), lit(nVerts)).as("v"))

    val oriented = Graph.triangleCount(uniform, "u", "v").head().getLong(0)
    val e = Graph.canonicalEdges(uniform, "u", "v").cache()
    e.count()
    val naive = e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"), col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .count()
    e.unpersist()
    println(s"[probe-spec] uniform triangles oriented=$oriented naive=$naive")
    assert(oriented == naive, "orientation must not change the count")

    val skewCount = Graph.triangleCount(skewed, "u", "v").head().getLong(0)
    println(s"[probe-spec] skewed triangles: $skewCount")
    assert(skewCount > 0L, "celebrity core must close triangles")
  }

  // --- SimilarityScaleProbe's clustered embedding corpus ---
  private val nVecs = 100000L

  test("similarity probe: IVF recall floor vs brute force on clustered corpus", Slow) {
    val dims = 64
    def u(seed: Column, d: Column, salt: Int): Column =
      pmod(xxhash64(seed, d, lit(salt)), lit(2001L)).cast("double") / 1000.0 - 1.0
    spark.range(nVecs)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dims - 1)), d =>
          (u(expr("id DIV 1000"), d, 1) * 0.9 + u(col("id"), d, 2) * 0.1).cast("float"))
          .as("embedding"))
      .write.mode("overwrite").parquet("target/probe_spec_sim")
    val mat = spark.read.parquet("target/probe_spec_sim")
    val queries = mat.filter(col("vec_id") % 20000 === 7) // 5 probes

    val brute = Similarity.bruteForceKnn(mat, queries, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.size == queries.count() * 10, "brute force must fill k")

    val nc = math.max(16, math.sqrt(nVecs.toDouble).toInt)
    val index = Similarity.ivfIndex(mat, nc)
    val ivf = Similarity.ivfQuery(index, queries, k = 10, nprobe = 32)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    println(f"[probe-spec] ivf recall@10: $recall%.3f")
    assert(recall >= 0.8,
      f"clustered corpus at nprobe=32/${nc} cells must recall >= 0.8, got $recall%.3f")
  }

  // --- CurationScaleProbe's pipeline (three audit shapes must agree) ---
  private val nCurationDocs = 100000L

  test("curation probe: single-pass, eager-audit, and observed counts agree", Slow) {
    dedupCorpus(nCurationDocs, dupPct = 10)
      .withColumn("source", concat(lit("src"), pmod(col("doc_id"), lit(4)).cast("string")))
      .write.mode("overwrite").parquet("target/probe_spec_curation")
    val mat = spark.read.parquet("target/probe_spec_curation")
    val bench = mat.filter(col("doc_id") % 211 === 0).select("doc_id", "text")
    val config = Curation.Config(
      languages = Set.empty, minTokens = 50, dedupExact = true,
      nearDupThreshold = Some(0.6),
      benchmark = Some(bench),
      contaminationK = 8,
      mixture = Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1))

    val single = Curation.curate(mat, config).count()
    val audit = scala.collection.mutable.Buffer.empty[Curation.StageCount]
    val audited = Curation.curate(mat, config, audit = Some(audit)).count()
    val (outObs, stageCounts) = Curation.curateObserved(mat, config)
    val observed = outObs.count()
    println(s"[probe-spec] curation rows single=$single audited=$audited observed=$observed")
    audit.foreach(s => println(s"[probe-spec]   ${s.stage}: ${s.rows}"))
    assert(single == audited && single == observed,
      "audit instrumentation must not change the pipeline")
    val obs = stageCounts().map(s => s.stage -> s.rows).toMap
    audit.foreach { s =>
      assert(obs.get(s.stage).contains(s.rows),
        s"stage ${s.stage}: eager=${s.rows} observed=${obs.get(s.stage)}")
    }
    assert(single > 0L && single < nCurationDocs)
  }

  // --- LakehouseScaleProbe's skip-index / z-order / merge claims ---
  private val nLakeRows = 2000000L

  test("lakehouse probe: pruned scans match full scan, merge preserves rows", Slow) {
    val df = spark.range(nLakeRows).select(
      col("id"),
      pmod(xxhash64(col("id")), lit(100000L)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(100000L)).as("y"),
      concat(lit("d"), pmod(col("id"), lit(32))).as("date"),
      (pmod(xxhash64(col("id"), lit(2)), lit(1000000L)) / 1000.0).as("v"))

    val zPath = "target/probe_spec_lake/z"
    Layout.zorderWrite(df, zPath, Seq("x", "y"), numFiles = 64)
    val idx = SkipIndex.build(spark, zPath, Seq("x", "y")).persist()
    assert(idx.count() == 64L, "one index row per file")

    val (zs, zRead, zTotal) = SkipIndex.rangeScan(spark, zPath, idx, "x", 10000L, 12000L)
    val (ys, yRead, _) = SkipIndex.rangeScan(spark, zPath, idx, "y", 10000L, 12000L)
    val full = spark.read.parquet(zPath)
      .filter(col("x") >= 10000L && col("x") <= 12000L).count()
    val fullY = spark.read.parquet(zPath)
      .filter(col("y") >= 10000L && col("y") <= 12000L).count()
    println(s"[probe-spec] lake x-scan $zRead/$zTotal files, y-scan $yRead/$zTotal files")
    assert(zs.count() == full, "x-pruned scan must equal full scan+filter")
    assert(ys.count() == fullY, "y-pruned scan must equal full scan+filter")
    assert(zRead < zTotal && yRead < zTotal,
      s"z-order must prune BOTH dims (x read $zRead, y read $yRead of $zTotal)")
    idx.unpersist()

    val tPath = "target/probe_spec_lake/t"
    IO.writeCuratedParquet(df, tPath, Seq("date"))
    val changes = spark.range(1000).select(
      (col("id") * 32).as("id"),
      lit(-1L).as("x"), lit(-1L).as("y"), lit("d0").as("date"), lit(0.0).as("v"))
      .union(spark.range(100).select((col("id") * 32 + 1).as("id"),
        lit(-1L).as("x"), lit(-1L).as("y"), lit("d1").as("date"), lit(0.0).as("v")))
    val stats = Lakehouse.mergeIntoParquet(spark, tPath, changes, Seq("id"), "date")
    println(s"[probe-spec] merge rewrote ${stats.rewrittenPartitions.mkString(",")} rows=${stats.touchedRows}")
    assert(stats.rewrittenPartitions.toSet == Set("d0", "d1"),
      "merge must rewrite exactly the touched partitions")
    assert(spark.read.parquet(tPath).count() == nLakeRows,
      "pure-update merge must preserve the row count")
    assert(spark.read.parquet(tPath).filter(col("x") === -1L).count() == 1100L,
      "all change rows must have replaced their targets")
  }
}
