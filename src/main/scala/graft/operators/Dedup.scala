package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed
  * around its 100 TB shuffle shape:
  *
  *  - exact: one hash-partitioned groupBy on the dedup key (map-side
  *    partial aggregation halves the shuffle) — never a window sort.
  *  - MinHash+LSH: candidate generation groups docs by (band, bandHash)
  *    bucket, so the shuffle is O(docs × bands) small fixed-width rows,
  *    never O(docs²); the quadratic verify runs only inside buckets.
  *  - SimHash: 64-bit signature; near-dup candidates via banded chunks of
  *    the signature (Hamming ≤ 3 ⇒ some 16-bit chunk equal, pigeonhole).
  *  - n-gram Jaccard: exact verify metric, computed on candidate pairs only.
  */
object Dedup {

  /** Exact dedup: keep the smallest `keyCol` per distinct `byCol`.
    * groupBy+min (partial agg, single shuffle) rather than
    * dropDuplicates (non-deterministic keeper) or a row_number window
    * (full sort per partition).
    */
  def exact(df: DataFrame, byCol: String, keyCol: String): DataFrame =
    df.groupBy(col(byCol)).agg(min(col(keyCol)).as(keyCol), count(lit(1)).as("copies"))

  /** Exact dedup returning the FULL surviving rows (the row holding the
    * smallest `keyCol` per `byCol` value): groupBy+min then a semi-join on
    * (byCol, keyCol) — still one partial-agg shuffle plus one join keyed
    * the same way, no window sort, deterministic keeper.
    */
  def exactRows(df: DataFrame, byCol: String, keyCol: String): DataFrame =
    df.join(
      df.groupBy(col(byCol)).agg(min(col(keyCol)).as(keyCol)),
      Seq(byCol, keyCol), "left_semi")
      .select(df.columns.map(col).toIndexedSeq: _*) // using-join puts keys first; restore order

  /** Exact dedup on a fingerprint (formatting-insensitive). */
  def exactByFingerprint(docs: DataFrame): DataFrame =
    docs.withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .groupBy("fp").agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("copies"))

  /** MinHash signature: `numHashes` independent min-hashes over word
    * shingles. The shingle strings are hashed ONCE (the expensive part);
    * the i-th permutation is a cheap 64-bit mix of that base hash
    * (xor-multiply family), not a fresh string hash — numHashes× less
    * string hashing for the same LSH behavior.
    */
  def minhashSignature(text: Column, shingleK: Int, numHashes: Int): Column =
    minhashFromShingles(TextAnalysis.shingles(text, shingleK), numHashes)

  /** LSH banding of a minhash signature: `bands` rows of `rowsPerBand`
    * hashes each; docs sharing any (band, bandHash) are candidates. The
    * band key is xxhash64 over the band's long values directly (plus the
    * band index) — candidacy is still exactly "equal band slice", but
    * without materializing a comma-joined string per band per doc
    * through interpreted lambdas.
    *
    * KEPT AS THE SEMANTIC REFERENCE ONLY (spec-tested bit-identical to
    * the fused path): feeding it `minhashFromShingles(...)` through an
    * alias is a trap — CollapseProject inlines the signature into every
    * `element_at`, re-running the whole minhash loop numHashes times per
    * row. The pipeline uses [[graft.functions.LshBands]], which fuses
    * signature + banding into one pass.
    */
  private[graft] def bandHashesColumns(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      xxhash64((lit(b) +: (0 until rowsPerBand).map(r =>
        element_at(sig, b * rowsPerBand + r + 1))): _*)
    }: _*)

  /** MinHash+LSH near-duplicate pairs with exact Jaccard verification.
    *
    * Pipeline: signature → explode bands → group by (band, hash) bucket →
    * emit in-bucket ordered pairs → distinct candidate pairs (a<b) →
    * verify exact shingle Jaccard ≥ `threshold`. The only shuffles are the
    * bucket groupBy and the distinct — both keyed on uniformly-hashed
    * values, so they stay balanced under skew. (`selfJoinPairs = true`
    * switches candidate generation to the textbook bucket self-join —
    * identical output, kept as the semantic reference; it plans the
    * signature pass twice, one per join side.)
    */
  def minhashNearDups(docs: DataFrame, shingleK: Int = 3, numHashes: Int = 16,
      bands: Int = 4, threshold: Double = 0.6,
      pruneSingletonBuckets: Boolean = false,
      selfJoinPairs: Boolean = false): DataFrame = {
    val rowsPerBand = numHashes / bands
    // Shingle ONCE per document — recomputing per candidate pair would be
    // O(pairs × doc-length), the difference between scan-bound and dead at
    // scale. The shingle relation is reused for both candidate generation
    // and verification, and carries 64-bit shingle HASHES, not strings:
    // signatures are bit-identical (same xxhash64 family) while the
    // verify join — the measured bottleneck at 10⁶ docs — ships a ~3×
    // narrower payload and compares primitive longs.
    val sh = docs.select(col("doc_id"),
      TextAnalysis.shingleHashes(col("text"), shingleK).as("sh"))

    // Docs too short to produce a shingle would all share the sentinel
    // signature and collide in every band — a self-inflicted hot bucket
    // (O(shortDocs²) candidates that exact-Jaccard then discards). They
    // can never reach any threshold > 0, so drop them before banding.
    val banded = sh.filter(size(col("sh")) > 0).select(col("doc_id"),
        posexplode(graft.functions.SketchFunctions.lsh_bands(col("sh"), numHashes, bands)))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bh"))
    // Optional singleton-bucket prefilter: buckets holding one doc can't
    // produce a pair, and on a mostly-unique corpus they are most of the
    // band relation. MEASURED OFF-BY-DEFAULT: unlike the winnowing df≥2
    // prefilter (which pays because the exploded fp relation is huge and
    // reused), `banded` here is cheap to ship but EXPENSIVE TO COMPUTE
    // (the minhash pass), and the prefilter adds a third computation of
    // it — 1M-doc probe: 25→40s dup-dense, 19→33s at 10% dup rate. Turn
    // it on only when `docs` is already materialized cheap (e.g. sigs
    // persisted) AND the corpus is dominated by singletons. Results are
    // identical either way.
    val pairable =
      if (!pruneSingletonBuckets) banded
      else banded.join(
        banded.groupBy("band", "bh").agg(count(lit(1)).as("n"))
          .filter(col("n") >= 2).select("band", "bh"),
        Seq("band", "bh"))
    // Candidate pairs via ONE shuffle: group each (band, bucket) to its
    // sorted member list, then emit ordered pairs in-row. The textbook
    // formulation is a bucket-keyed SELF-JOIN, but a self-join plans the
    // band relation — i.e. the whole minhash pass, the expensive part —
    // TWICE (the two exchange subtrees canonicalize differently once AQE
    // wraps them, so ReuseExchange never fires), plus a third shuffle for
    // the pair distinct. Grouping runs the signature pass once and
    // replaces join+distinct with groupBy+distinct. Per-bucket work is
    // still the unavoidable O(n²) pair emission, spread across tasks by
    // the uniform bucket key; the posexplode keeps peak memory at O(n)
    // per row rather than materializing an n² pair array per bucket.
    val candidates = (if (selfJoinPairs) {
      pairable.select(col("band"), col("bh"), col("doc_id").as("a_id"))
        .join(pairable.select(col("band"), col("bh"), col("doc_id").as("b_id")),
          Seq("band", "bh"))
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id")
    } else {
      val buckets = pairable.groupBy(col("band"), col("bh"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) >= 2)
      buckets
        .select(posexplode(col("ids")).as(Seq("i", "a_id")), col("ids"))
        .select(col("a_id"),
          explode(slice(col("ids"), col("i") + 2, size(col("ids")) - col("i") - 1)).as("b_id"))
    }).dropDuplicates("a_id", "b_id")

    candidates
      .join(sh.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), "b_id")
      .withColumn("jaccard", jaccardOfShingleArrays(col("a_sh"), col("b_sh")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Minhash signature from a precomputed shingle array — fused native
    * expression (graft.functions.MinHashSig): one loop hashing each
    * shingle string once and mixing per permutation, instead of
    * numHashes × interpreted transform passes.
    */
  def minhashFromShingles(sh: Column, numHashes: Int): Column =
    graft.functions.SketchFunctions.minhash_sig(sh, numHashes)

  /** Jaccard of two precomputed DISTINCT shingle arrays — fused native
    * expression (graft.functions.JaccardSim): one membership loop, no
    * intersect/union array materialization.
    */
  def jaccardOfShingleArrays(sa: Column, sb: Column): Column =
    graft.functions.SketchFunctions.jaccard_sim(sa, sb)

  /** Size-ratio prefilter: for distinct sets, jaccard ≤ min/max of the two
    * set sizes, so pairs with min < threshold·max can never reach the
    * threshold — skip their membership loop entirely. Semantics-preserving.
    */
  private def sizeRatioMayReach(sa: Column, sb: Column, threshold: Double): Column =
    size(sa).cast("double") >= lit(threshold) * size(sb) &&
      size(sb).cast("double") >= lit(threshold) * size(sa)

  /** Exact n-gram Jaccard between two raw texts (convenience form). */
  def jaccardShingles(a: Column, b: Column, k: Int): Column =
    jaccardOfShingleArrays(TextAnalysis.shingles(a, k), TextAnalysis.shingles(b, k))

  /** All-pairs n-gram Jaccard above a threshold. Exact but O(n²) pairs —
    * the verification metric; use minhashNearDups for candidate generation
    * at scale. Shingles are computed once per doc, not per pair.
    *
    * The streamed side is repartitioned to the session's default
    * parallelism first: a small doc subset otherwise sits in one input
    * split, and the nested-loop join runs its n²/2 Jaccard evaluations on
    * a single core while the rest of the cluster idles.
    */
  def ngramJaccardPairs(docs: DataFrame, k: Int = 3, threshold: Double = 0.5): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val sh = docs.select(col("doc_id"), TextAnalysis.shingles(col("text"), k).as("sh"))
    val a = sh.repartition(par).select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val b = sh.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .filter(sizeRatioMayReach(col("a_sh"), col("b_sh"), threshold))
      .withColumn("jaccard", jaccardOfShingleArrays(col("a_sh"), col("b_sh")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Prefix-filtered exact set-similarity join (the PPJoin family, Xiao
    * et al. 2008 "Efficient Similarity Joins for Near Duplicate
    * Detection") — the EXACT-Jaccard scale path. Same output contract as
    * [[ngramJaccardPairs]] (every pair with shingle-Jaccard ≥ threshold),
    * but candidates come from an inverted index over each doc's PREFIX
    * under a global rarest-first token order instead of an all-pairs
    * product: two sets with J ≥ t and sizes n must share a token among
    * their first n − ⌈t·n⌉ + 1 rarest shingles (pigeonhole on the
    * required overlap), so joining on prefix tokens loses nothing, and
    * at t = 0.9 the prefix is ~10% of each doc. Flow: document-frequency
    * pass → rarest-first sort per doc → prefix explode → token-keyed
    * equi-join (+ size-compatibility pruning t·nb ≤ na ∧ t·na ≤ nb) →
    * exact Jaccard verify on the candidate pairs only. Every shuffle is
    * keyed (token or doc id); nothing is quadratic in the corpus —
    * verification work is proportional to candidates, which the prefix
    * theorem bounds to genuinely-similar + rare-token-sharing pairs.
    */
  def ppjoinPairs(docs: DataFrame, k: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold in (0, 1]")
    // NOT pinned, decided by a 10× scale test: the executed plan does
    // carry twelve corpus scans (the shingle pass re-executed per
    // consumer), but a Materialize pin of the shingle table measured
    // pinned 2.69 s vs unpinned 2.43 s at 10× data — the shingle arrays
    // are LARGER than the text they derive from, so checkpointing them
    // costs more than the shuffle-free scan+map recompute (contrast
    // hammingNearDups' snap, which pins a 16-byte-per-row SIGNATURE —
    // far smaller than its recompute input). Pin only relations smaller
    // than their recompute, or whose recompute crosses a shuffle.
    val sh = docs.select(col("doc_id"),
      TextAnalysis.shingles(col("text"), k).as("sh"))
      .filter(size(col("sh")) > 0)
    val tok = sh.select(col("doc_id"), explode(col("sh")).as("t"))
    val freq = tok.groupBy("t").agg(count(lit(1)).as("df"))
    // rarest-first total order: (document frequency, token) ascending
    val ordered = tok.join(freq, "t")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("t")))).as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).as("n"),
        (size(col("toks")) - ceil(lit(threshold) * size(col("toks"))) + 1)
          .cast("int").as("p"))
    val prefix = ordered
      .select(col("doc_id"), col("n"),
        explode(slice(col("toks"), lit(1), col("p"))).as("pt"))
      .select(col("doc_id"), col("n"), col("pt.t").as("t"))
    val cands = prefix.select(col("doc_id").as("a_id"), col("n").as("na"), col("t"))
      .join(prefix.select(col("doc_id").as("b_id"), col("n").as("nb"), col("t")), Seq("t"))
      .filter(col("a_id") < col("b_id") &&
        lit(threshold) * col("nb") <= col("na") &&
        lit(threshold) * col("na") <= col("nb"))
      .select("a_id", "b_id").distinct()
    cands
      .join(sh.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), "b_id")
      .withColumn("jaccard", jaccardOfShingleArrays(col("a_sh"), col("b_sh")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash of the token multiset: per bit, majority vote of the
    * tokens' xxhash64 bits (ties → 0). Computed entirely per-row by a
    * fused native expression (graft.functions.SimHash64) — no explode, no
    * groupBy, ZERO shuffle: at 100 TB the signature pass is map-only and
    * runs at scan speed; only the candidate join afterwards shuffles (and
    * that is keyed on 16-bit chunks).
    */
  def simhashExpr(text: Column): Column =
    graft.functions.SketchFunctions.simhash64(TextAnalysis.tokens(text))

  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), simhashExpr(col(textCol)).as("simhash"))

  /** Hamming near-dup candidates over ANY 64-bit signature column (simhash,
    * perceptual hash, …): split each signature into equal chunks — by
    * pigeonhole, Hamming ≤ h forces at least one chunk equal when there
    * are > h chunks — equi-join on (chunk index, chunk value), then filter
    * to true Hamming ≤ `maxHamming` via bit_count(xor). The chunk count is
    * the smallest power of two giving the guarantee, so the join keys stay
    * as wide (selective) as correctness allows.
    */
  def hammingNearDups(sigs: DataFrame, idCol: String, sigCol: String,
      maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15, "maxHamming must be in [0, 15]")
    val chunks = if (maxHamming < 4) 4 else if (maxHamming < 8) 8 else 16
    val width = 64 / chunks
    val mask = (1L << width) - 1
    // The signature relation feeds BOTH sides of the self-join below, so
    // without materialization the upstream signature pass (codec feature
    // extraction for media, tokenize+simhash for text) executes twice.
    // Materialize pins just (id, sig) — ~16 B a row, cluster-cacheable
    // even at 10^10 docs — runs the expensive pass once, and lets block
    // cleanup ride on GC (the lazy result gives no unpersist point).
    // Mode (localCheckpoint vs fault-tolerant persist vs off) is the
    // graft.materialize.mode conf — see [[Materialize]].
    val snap = Materialize(sigs.select(col(idCol), col(sigCol)))
    val chunked = snap.select(col(idCol), col(sigCol),
      posexplode(array((0 until chunks).map(c =>
        shiftrightunsigned(col(sigCol), c * width).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "ch")
    val a = chunked.select(col("chunk"), col("ch"),
      col(idCol).as("a_id"), col(sigCol).as("a_sig"))
    val b = chunked.select(col("chunk"), col("ch"),
      col(idCol).as("b_id"), col(sigCol).as("b_sig"))
    a.join(b, Seq("chunk", "ch")).filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", bit_count(col("a_sig").bitwiseXOR(col("b_sig"))))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }

  /** SimHash near-dup candidates: [[hammingNearDups]] over the map-only
    * text signatures.
    */
  def simhashNearDups(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    hammingNearDups(simhash(docs), "doc_id", "simhash", maxHamming)

  /** Winnowing-based containment candidates: documents sharing at least
    * `minShared` winnowing fingerprints. Fingerprinting is map-only; pair
    * generation groups the exploded (doc, fp) relation by fingerprint
    * value (uniform 64-bit hashes → balanced shuffle) and emits in-bucket
    * pairs, never O(docs²).
    */
  def winnowingNearDups(docs: DataFrame, k: Int = 5, w: Int = 4,
      minContainment: Double = 0.5, maxDocFreq: Int = 50,
      scratchDir: Option[String] = None,
      selfJoinPairs: Boolean = false,
      pinGrouped: Boolean = false): DataFrame = {
    if (selfJoinPairs)
      return winnowingNearDupsSelfJoin(docs, k, w, minContainment, maxDocFreq, scratchDir)
    val exploded = docs.select(col("doc_id"),
      explode(TextAnalysis.winnowingFingerprints(col("text"), k, w)).as("fp"))
    // ONE shuffle keyed on fp groups each fingerprint to its sorted
    // member list; everything downstream (document frequency = list
    // size, per-doc surviving-fp counts, in-bucket pair emission)
    // derives from this relation, so the rolling-hash fingerprint pass
    // runs twice (once per consumer below) instead of the ~6 leaf
    // occurrences the df-join + fp self-join formulation plans (Spark
    // has no cross-consumer subplan reuse, and AQE-wrapped exchanges
    // never canonicalize equal). Fingerprints are distinct per doc, so
    // size(ids) IS document frequency; a fp in more than `maxDocFreq`
    // docs is boilerplate, not evidence of copying — and exactly what
    // would make pair emission quadratic (d docs → d² pairs), so the
    // cap also bounds every bucket's fan-out.
    val groupedRaw = exploded.groupBy("fp")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) <= maxDocFreq)
    // `scratchDir` materializes the grouped relation to parquet once —
    // then the fingerprint pass runs ONCE total; the caller owns
    // cleanup. MEASURED OFF-BY-DEFAULT (1M docs, local[32]): writing the
    // ~150M-row grouped relation costs more than the one recompute it
    // saves (22→60 s) because fingerprinting streams from page-cached
    // source parquet; reach for it only when upstream `docs` is itself
    // expensive (a join/filter pipeline, cold object storage). Results
    // identical either way (spec-pinned).
    val grouped = scratchDir match {
      case Some(dir) =>
        groupedRaw.write.mode("overwrite").parquet(dir)
        docs.sparkSession.read.parquet(dir)
      // pinGrouped: Materialize the grouped relation so the
      // tokenize+fingerprint+groupBy pipeline runs ONCE instead of once
      // per consumer (sizes + shared). Measured round-17 on the d7
      // corpus with the noop sink (min-of-3, sf0.1): pinned 27.7 s vs
      // unpinned 27.1 s — the checkpoint of the near-input-size
      // (fp, ids) relation costs ≥ the one fingerprint recompute it
      // saves (which rides the page cache), and the uncapped pair
      // phase dominates either way. OFF stays the default; the knob
      // records the measurement point.
      case None if pinGrouped => Materialize(groupedRaw)
      case None => groupedRaw
    }
    // containment denominator: how many sub-cap fps each doc kept
    val sizes = grouped.select(explode(col("ids")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_fps"))
    // ordered in-bucket pairs, then count shared fps per pair; the
    // posexplode keeps per-row memory at O(bucket), never O(bucket²)
    val shared = grouped.filter(size(col("ids")) >= 2)
      .select(posexplode(col("ids")).as(Seq("i", "a_id")), col("ids"))
      .select(col("a_id"),
        explode(slice(col("ids"), col("i") + 2, size(col("ids")) - col("i") - 1)).as("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("shared_fps"))
    // containment = shared / |smaller surviving fp set| — robust to length
    // asymmetry (detects a document embedded inside a larger one)
    shared
      .join(sizes.select(col("doc_id").as("a_id"), col("n_fps").as("a_n")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("n_fps").as("b_n")), "b_id")
      .withColumn("containment",
        col("shared_fps").cast("double") / least(col("a_n"), col("b_n")))
      .filter(col("containment") >= minContainment)
      .select(col("a_id"), col("b_id"), col("shared_fps"),
        round(col("containment"), 6).as("containment"))
  }

  /** The df-join + fp self-join formulation — kept as the spec-tested
    * semantic reference for the grouped path above. Plans the fingerprint
    * pass once per leaf occurrence (~6×).
    */
  private def winnowingNearDupsSelfJoin(docs: DataFrame, k: Int, w: Int,
      minContainment: Double, maxDocFreq: Int,
      scratchDir: Option[String]): DataFrame = {
    val explodedRaw = docs.select(col("doc_id"),
      explode(TextAnalysis.winnowingFingerprints(col("text"), k, w)).as("fp"))
    val exploded = scratchDir match {
      case Some(dir) =>
        explodedRaw.write.mode("overwrite").parquet(dir)
        docs.sparkSession.read.parquet(dir)
      case None => explodedRaw
    }
    val dfByFp = exploded.groupBy("fp").agg(count(lit(1)).as("df"))
    val kept = exploded.join(dfByFp.filter(col("df") <= maxDocFreq).select("fp"), "fp")
    val sizes = kept.groupBy("doc_id").agg(count(lit(1)).as("n_fps"))
    val pairable = exploded.join(
      dfByFp.filter(col("df") >= 2 && col("df") <= maxDocFreq).select("fp"), "fp")
    val shared = pairable.select(col("fp"), col("doc_id").as("a_id"))
      .join(pairable.select(col("fp"), col("doc_id").as("b_id")), "fp")
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("shared_fps"))
    shared
      .join(sizes.select(col("doc_id").as("a_id"), col("n_fps").as("a_n")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("n_fps").as("b_n")), "b_id")
      .withColumn("containment",
        col("shared_fps").cast("double") / least(col("a_n"), col("b_n")))
      .filter(col("containment") >= minContainment)
      .select(col("a_id"), col("b_id"), col("shared_fps"),
        round(col("containment"), 6).as("containment"))
  }

  /** Connected components over a near-duplicate pair list — the step that
    * turns pairwise matches into dedup clusters (keep one representative
    * per component).
    *
    * Two execution paths, chosen by the size of the EDGE list (never the
    * corpus): near-dup edges are a small fraction of the corpus that
    * produced them, and only edge-touched vertices need any graph work at
    * all — every other vertex is its own singleton component, labeled by
    * one final map-side-prunable left join.
    *
    *  - edge count ≤ `localEdgeThreshold`: union-find ON THE DRIVER over
    *    the collected edge list — the same small-graph finish GraphFrames
    *    performs after contraction. 10⁶ edges is a few tens of MB, well
    *    inside any driver. The label table comes back as a LocalRelation,
    *    so the final corpus join broadcasts it without running a job, and
    *    downstream actions re-evaluate a driver-local array instead of
    *    re-running the (possibly expensive) edge generator per action.
    *  - above the threshold: the distributed min-label-propagation loop
    *    below, seeded with edge-touched vertices only. Each round every
    *    vertex adopts the smallest label among (its own, its neighbors',
    *    its label's label) — propagation plus pointer jumping. The jump is
    *    what makes long chains cheap: propagation alone needs diameter
    *    rounds (a 230-vertex chainy component measured 18), with jumping
    *    label paths halve every round — O(log diameter). Each round is two
    *    id-keyed joins + one partial-aggregated groupBy, nothing ever
    *    O(V²).
    *
    * Precondition (both paths, matching the DuckDB closure oracle): edge
    * endpoints are drawn from `vertices` — true for every dedup pair list,
    * which is generated from the corpus itself.
    *
    * Output: (id, comp) where comp = smallest vertex id in the component;
    * vertices absent from `edges` keep comp = id.
    */
  def connectedComponents(edges: DataFrame, vertices: DataFrame,
      idCol: String = "doc_id", aCol: String = "a_id", bCol: String = "b_id",
      maxIter: Int = 50, loopShufflePartitions: Int = 0,
      localEdgeThreshold: Long = 1000000L): DataFrame = {
    val spark = edges.sparkSession
    val eSrc = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
    val eRdd = eSrc.rdd.persist()
    val eCount = eRdd.count()
    val idType = eSrc.schema.head.dataType
    val ord = idOrdering(idType)
    val small = eCount <= localEdgeThreshold && ord.isDefined
    val touched: DataFrame = // (id, comp) for edge-touched vertices only
      if (small) localUnionFind(eRdd, idType, ord.get, spark)
      else labelPropagation(eRdd, idType, spark, maxIter, loopShufflePartitions)
    eRdd.unpersist(blocking = false)
    // Everything not in an edge is a singleton. On the small path the
    // label table is a LocalRelation (driver array) — broadcast it so the
    // corpus side stays a single map-only pass. Above the threshold it
    // shuffle-joins keyed on id.
    val labelSide = {
      val t = touched.withColumnRenamed("id", idCol)
      if (small) broadcast(t) else t
    }
    vertices.select(col(idCol))
      .join(labelSide, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("comp"), col(idCol)).as("comp"))
  }

  /** Soft dedup: instead of DROPPING near-duplicates, keep every doc
    * downweighted by its cluster size — weight = ⌊10⁶ / |cluster|⌋
    * micro-units, so each near-dup cluster contributes ~one doc's worth
    * of training mass in expectation (the SoftDeDup / "document-level
    * duplication count" recipe: hard dedup loses the signal that a doc
    * was popular; soft dedup keeps it, bounded). Exact integer weights —
    * engine-stable, and Σ weights over a cluster never exceeds 10⁶.
    *
    * Composition on top of [[connectedComponents]]: one partial-agg
    * shuffle for cluster sizes keyed on the component label, one keyed
    * join back — both scale-safe; singletons get weight exactly 10⁶.
    */
  def softDedupWeights(edges: DataFrame, vertices: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val comps = connectedComponents(edges, vertices, idCol)
    val sizes = comps.groupBy("comp").agg(count(lit(1)).as("cluster_size"))
    comps.join(sizes, Seq("comp"))
      .withColumn("weight_x1e6", expr("1000000 div cluster_size"))
      .select(col(idCol), col("comp"), col("cluster_size"), col("weight_x1e6"))
  }

  /** Orderings for min-label id types (mirrors Spark's `least`/`min`
    * ordering on these types). Unsupported id types fall back to the
    * distributed loop, which orders via Spark itself.
    */
  private def idOrdering(dt: org.apache.spark.sql.types.DataType): Option[Ordering[Any]] = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType    => Some(Ordering.by[Any, Long](_.asInstanceOf[Long]))
      case IntegerType => Some(Ordering.by[Any, Int](_.asInstanceOf[Int]))
      case ShortType   => Some(Ordering.by[Any, Short](_.asInstanceOf[Short]))
      case StringType  => Some(Ordering.by[Any, String](_.asInstanceOf[String]))
      case _           => None
    }
  }

  /** Small-graph path: union-find over the collected edge list ON THE
    * DRIVER (one collect job from the persisted edge RDD; ≤ the 10⁶-edge
    * threshold = tens of MB). Path-halving keeps finds near-O(1); roots
    * are the component minima by construction (union always points the
    * larger root at the smaller). Returns a LocalRelation of (id, comp)
    * for every vertex appearing in an edge — re-evaluating it downstream
    * costs nothing, unlike a task-side formulation whose union-find (and
    * the whole edge generator above it) re-runs on every action.
    */
  private def localUnionFind(eRdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row],
      idType: org.apache.spark.sql.types.DataType, ord: Ordering[Any],
      spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StructField, StructType}
    val parent = new java.util.HashMap[Any, Any]()
    def find(x0: Any): Any = {
      if (!parent.containsKey(x0)) { parent.put(x0, x0); x0 }
      else {
        var x = x0
        var p = parent.get(x)
        while (p != x) { // path halving
          val gp = parent.get(p)
          parent.put(x, gp)
          x = gp
          p = parent.get(x)
        }
        x
      }
    }
    eRdd.collect().foreach { r =>
      val (ra, rb) = (find(r.get(0)), find(r.get(1)))
      if (ra != rb) {
        if (ord.lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    val rows = new java.util.ArrayList[Row](parent.size())
    val it = parent.keySet().iterator()
    while (it.hasNext) { val k = it.next(); rows.add(Row(k, find(k))) }
    spark.createDataFrame(rows,
      StructType(Seq(StructField("id", idType), StructField("comp", idType))))
  }

  /** Distributed path: min-label propagation + pointer jumping over the
    * edge-touched vertex set.
    *
    * Two things make the loop viable: the edge relation is persisted once
    * (or an expensive upstream pair generator re-executes every round),
    * and each round's labels are materialized through an RDD round-trip
    * (localCheckpoint + createDataFrame), which BOTH truncates lineage
    * AND resets plan statistics. Plain persist leaves the logical plan
    * growing a round deeper every iteration; `Dataset.localCheckpoint`
    * truncates the plan but REWRITES the old plan's stats into the new
    * leaf — and since each round's plan references the label relation
    * several times, the size-in-bytes estimate is raised to a power every
    * round: double-exponential growth that ends with Catalyst multiplying
    * megabit-long BigIntegers on the driver (measured: the loop went from
    * seconds to never-terminating around round 10). The RDD round-trip
    * pins stats at the default leaf estimate instead. On a cluster,
    * prefer a reliable `checkpoint` directory to survive executor loss.
    */
  private def labelPropagation(eRdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row],
      idType: org.apache.spark.sql.types.DataType,
      spark: org.apache.spark.sql.SparkSession,
      maxIter: Int, loopShufflePartitions: Int): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    // The loop's relations are label tables, orders of magnitude smaller
    // than the corpus that produced the edges — running its joins at the
    // session's corpus-sized shuffle width burns a fixed per-round
    // scheduling cost that dominates the whole operator. The loop runs in
    // a CHILD session (same SparkContext, its own SQLConf) with the width
    // scoped down (explicit param wins; else a label-count heuristic) —
    // mutating the caller's session conf would silently re-plan any
    // concurrent query on it at the scoped-down width.
    val loop = spark.newSession()
    val eSchema = StructType(Seq(
      StructField("src", idType), StructField("dst", idType)))
    val half = loop.createDataFrame(eRdd, eSchema)
    val sym = half.union(half.select(col("dst").as("src"), col("src").as("dst")))
    // materialize: truncate lineage AND reset plan stats (see Scaladoc)
    // each round's pinned RDD is unpersisted as soon as the NEXT round is
    // materialized (its blocks are dead weight the moment the successor
    // exists); the final round's pin is handed to Materialize's registry
    // so the batch-driver sweep frees it at the query boundary
    var prevPin: org.apache.spark.rdd.RDD[_] = null
    var labels = {
      val df = sym.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("comp"))
      val rdd = df.rdd
      rdd.localCheckpoint()
      rdd.count()
      prevPin = rdd
      loop.createDataFrame(rdd, df.schema)
    }
    val loopWidth =
      if (loopShufflePartitions > 0) loopShufflePartitions
      else math.max(1, math.min(
        spark.conf.get("spark.sql.shuffle.partitions").toInt,
        (labels.count() / 250000L).toInt + 1))
    loop.conf.set("spark.sql.shuffle.partitions", loopWidth.toString)
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
        val neighborMin = sym
          .join(labels.select(col("id").as("dst"), col("comp")), "dst")
          .groupBy(col("src").as("id")).agg(min(col("comp")).as("ncomp"))
        // pointer jumps: resolve each label through the current mapping
        // twice — a chain a→b→c→d collapses to a→d within one round. The
        // extra join is stages inside the SAME job; in a loop whose cost
        // is per-round job overhead, trading a join for fewer rounds wins.
        val jump1 = labels.select(col("id").as("m1"), col("comp").as("j1"))
        val jump2 = labels.select(col("id").as("m2"), col("comp").as("j2"))
        val next = labels
          .join(neighborMin, Seq("id"), "left")
          .withColumn("m1", least(col("comp"), coalesce(col("ncomp"), col("comp"))))
          .join(jump1, Seq("m1"), "left")
          .withColumn("m2", least(col("m1"), coalesce(col("j1"), col("m1"))))
          .join(jump2, Seq("m2"), "left")
          .withColumn("newcomp", least(col("m2"), coalesce(col("j2"), col("m2"))))
          .select(col("id"), col("newcomp").as("comp"),
            (col("newcomp") < col("comp")).as("ch"))
        // one job per round: the changed-row tally rides the
        // materialization pass as an accumulator instead of a second
        // count. Task retries can only OVERcount a non-zero tally (a
        // zero stays zero), so the convergence exit is never premature.
        val acc = spark.sparkContext.longAccumulator("cc_changed")
        val rdd = next.rdd.map { r => if (r.getBoolean(2)) acc.add(1L); r }
        rdd.localCheckpoint()
        rdd.count()
        if (prevPin != null) prevPin.unpersist(blocking = false)
        prevPin = rdd
        changed = acc.value
        labels = loop.createDataFrame(rdd, next.schema).select("id", "comp")
        it += 1
    }
    if (prevPin != null) Materialize.registerPinned(prevPin)
    // hand the result back as a DataFrame of the CALLER's session (the
    // checkpointed label RDD underneath is session-independent)
    spark.createDataFrame(labels.rdd, labels.schema)
  }

  /** Embedding-cosine near-duplicates: pairs with cosine ≥ `threshold`.
    * Exact form is the O(n²) cross join (verification metric); the scale
    * path buckets by random-hyperplane LSH first (Similarity.hyperplaneLsh)
    * so only same-bucket pairs are compared.
    */
  def embeddingNearDups(embeddings: DataFrame, threshold: Double = 0.95,
      lsh: Boolean = false, planes: Int = 8): DataFrame = {
    val base = embeddings.select(col("vec_id"), col("embedding"))
    val withKey =
      if (lsh) base.withColumn("bucket", Similarity.hyperplaneLsh(col("embedding"), planes))
      else base.withColumn("bucket", lit(0))
    val a = withKey.select(col("bucket"), col("vec_id").as("a_id"), col("embedding").as("a_vec"))
    val b = withKey.select(col("bucket"), col("vec_id").as("b_id"), col("embedding").as("b_vec"))
    a.join(b, Seq("bucket")).filter(col("a_id") < col("b_id"))
      .withColumn("cosine", Similarity.cosine(col("a_vec"), col("b_vec")))
      .filter(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cosine"), 6).as("cosine"))
  }

  /** Non-overlapping `words`-word passages of a document (CCNet-style
    * units). Whitespace tokens, lowercased; the last passage may be
    * shorter; an empty/whitespace-only document has no passages.
    */
  def passages(text: Column, words: Int): Column = {
    require(words >= 1, "passage width must be >= 1")
    val toks = TextAnalysis.tokens(text)
    when(size(toks) === 0, array().cast("array<string>"))
      .otherwise(transform(
        // int operands stay well under 2^53, so the double division
        // truncates exactly; floor makes the intent explicit anyway
        sequence(lit(0), floor((size(toks) - 1) / lit(words)).cast("int")),
        i => array_join(slice(toks, i * words + 1, lit(words)), " ")))
  }

  /** Passage-level exact dedup (the CCNet/Gopher paragraph-dedup shape,
    * over word windows since the corpus has no paragraph marks): split
    * every document into non-overlapping `words`-word passages, keep only
    * the corpus-wide FIRST occurrence of each distinct passage (ordered
    * by (doc id, passage index)), and reassemble each document from its
    * surviving passages.
    *
    * Shuffle shape at scale: one partial-aggregated groupBy keyed on the
    * passage text (uniformly distributed — boilerplate passages collapse
    * map-side), one co-keyed join back, one groupBy on doc id to
    * reassemble. Nothing is ever O(docs²) and no window sort over the
    * corpus. At 100 TB, key the first-occurrence groupBy on
    * xxhash64(passage) instead of the string to cut the shuffle width
    * ~4×; the string form is kept here for cross-engine verifiability.
    *
    * Output: (idCol, n_passages, n_kept, clean_text) for EVERY input
    * document — a fully-deduplicated doc keeps 0 passages and an empty
    * clean_text.
    */
  def passageDedup(docs: DataFrame, words: Int = 25,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val ex = docs.select(col(idCol),
      posexplode(passages(col(textCol), words)).as(Seq("p_idx", "passage")))
    // first occurrence = min (doc, idx) pair under struct ordering —
    // partial-aggregated, unlike a row_number window over the corpus
    val first = ex.groupBy("passage")
      .agg(min(struct(col(idCol), col("p_idx"))).as("f"))
    val kept = ex.join(first, "passage")
      .filter(col(idCol) === col(s"f.$idCol") && col("p_idx") === col("f.p_idx"))
      .select(col(idCol), col("p_idx"), col("passage"))
    val perDoc = ex.groupBy(idCol).agg(count(lit(1)).as("n_passages"))
    val keptAgg = kept.groupBy(idCol).agg(
      count(lit(1)).as("n_kept"),
      array_join(transform(
        array_sort(collect_list(struct(col("p_idx"), col("passage")))),
        x => x.getField("passage")), " ").as("clean_text"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .join(keptAgg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_passages"), lit(0L)).as("n_passages"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Benchmark decontamination report (the GPT-3/PaLM eval-overlap
    * check): for each training document, the number of distinct word
    * `k`-grams it shares with ANY benchmark document. Only contaminated
    * docs appear (n_shared ≥ 1).
    *
    * Scale shape: the benchmark side is always tiny next to a training
    * corpus, so its distinct shingle set is BROADCAST — the 100 TB side
    * is scanned map-only (shingle, hash-probe, discard), and the only
    * shuffle is the per-doc count over the few rows that actually hit.
    * At 100 TB carry `TextAnalysis.shingleHashes` instead of shingle
    * strings (identical join semantics, ~3× narrower rows).
    */
  def contaminationReport(train: DataFrame, bench: DataFrame, k: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tsh = train.select(col(idCol),
      explode(TextAnalysis.shingles(col(textCol), k)).as("sh"))
    val bsh = bench.select(explode(TextAnalysis.shingles(col(textCol), k)).as("sh"))
      .distinct()
    tsh.join(broadcast(bsh), "sh")
      .groupBy(idCol).agg(count(lit(1)).as("n_shared"))
  }

  /** Drop every training document sharing at least one word `k`-gram with
    * the benchmark set (anti-join against [[contaminationReport]]).
    */
  def decontaminate(train: DataFrame, bench: DataFrame, k: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    train.join(contaminationReport(train, bench, k, idCol, textCol)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /** Incremental exact dedup — the daily-batch shape of [[exactByFingerprint]]:
    * from a new `batch`, keep only rows that are (a) the first occurrence
    * of their normalized fingerprint WITHIN the batch and (b) novel
    * against the already-curated `corpus`. The curated table never gets
    * rewritten and never re-deduplicates itself — each increment costs
    * O(batch) work plus one anti-join against the corpus fingerprints.
    *
    * Scale shape: the intra-batch dedup is a partial-aggregated groupBy
    * on the (uniform) md5 key; the anti-join shuffles batch and corpus
    * on that same key — balanced under any skew, and in production the
    * corpus side is the STORED fingerprint column of the curated table
    * (a narrow index scan), not a re-fingerprinting of 100 TB of text.
    */
  def incrementalNew(corpus: DataFrame, batch: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // NULL text -> NULL fingerprint would fail BOTH equi-joins below and
    // silently drop the row; fold it into the empty-text fingerprint so
    // null/empty documents dedup against each other like any other value
    def fp(c: org.apache.spark.sql.Column) =
      TextAnalysis.fingerprint(coalesce(c, lit("")))
    val bfp = batch.withColumn("__fp", fp(col(textCol)))
    val firstInBatch = bfp.join(
      bfp.groupBy(col("__fp")).agg(min(col(idCol)).as(idCol)),
      Seq("__fp", idCol), "left_semi")
    firstInBatch
      .join(corpus.select(fp(col(textCol)).as("__fp")), Seq("__fp"), "left_anti")
      .select(batch.columns.map(col).toIndexedSeq: _*)
  }

  /** Bloom-filter decontamination — the scale path for benchmark sets
    * too large to broadcast as an exact shingle set (1e9 distinct
    * 8-grams ≈ 60+ GB of strings; the Bloom filter at the same
    * cardinality and fpp=1e-3 is ~1.7 GB of bits, and smaller benches
    * shrink proportionally). The filter is built DISTRIBUTED over the
    * bench side (`stat.bloomFilter` tree-aggregates partial filters),
    * then probes ride the training scan as a per-row bit test — the
    * 100 TB side stays map-only with no join at all.
    *
    * Guarantee: NO false negatives — every truly contaminated document
    * is dropped; an ~fpp fraction of clean documents is dropped with
    * them (the conservative direction for decontamination). The exact
    * [[decontaminate]] is the verification metric.
    */
  def decontaminateBloom(train: DataFrame, bench: DataFrame, k: Int = 8,
      fpp: Double = 0.001, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // NO distinct before the build: Bloom insertion is idempotent, so
    // deduplicating first would only add a full shuffle of the shingle
    // set. Sizing by the raw occurrence count (≥ the distinct count)
    // over-provisions bits — the realized fpp is at most the requested
    // one. Both passes over the bench side stay shuffle-free.
    val bsh = bench.select(
      explode(TextAnalysis.shingleHashes(col(textCol), k)).as("h"))
    val expected = math.max(1L, bsh.count())
    val bloom = bsh.stat.bloomFilter("h", expected, fpp)
    val probe = graft.functions.BloomMightContain.mightContain _
    // coalesce: a NULL text yields a NULL shingle array -> NULL exists()
    // -> filter would silently DROP the row, where the exact path's
    // explode produces no rows and KEEPS it. No shingles = no overlap.
    train.filter(!coalesce(exists(
      TextAnalysis.shingleHashes(col(textCol), k), h => probe(h, bloom)),
      lit(false)))
  }
}
