package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text ranked retrieval over a document corpus — BM25, the
  * lexical-search workhorse a training-data pipeline leans on for
  * retrieval-based decontamination, targeted corpus probes ("find every
  * doc about X"), and hard-negative mining next to the embedding kNN in
  * [[Similarity]] (reference analog: the ad-hoc Athena LIKE-scans in
  * README.md:128-133, re-expressed as a scored ranking).
  *
  * Shape, designed for 100 TB: there is NO inverted index materialized
  * and NO explode — per-query-term tf comes from a map-only
  * `filter(tokens, _ == term)` over each row, so the scan stays inside
  * whole-stage codegen; the corpus statistics (N, avgdl, per-term df)
  * are ONE scalar aggregate broadcast back by cross join; the final
  * ranking is a TakeOrderedAndProject (bounded top-k, never a global
  * sort). Two passes over the text, zero wide shuffles. For a standing
  * query workload you'd materialize `termFrequencies` once and reuse it;
  * for ad-hoc queries this one-shot plan is already scan-bound.
  *
  * Determinism contract (the oracle-parity discipline of
  * [[graft.queries.QueryDef]]): tf/df/dl are exact integers; the score
  * combines them with a FIXED left-to-right association identical on
  * both engines, rounds to 6 decimals before ranking, and breaks ties
  * by doc id — so the top-k is a total order. RESIDUAL RISK, by design:
  * `ln` is evaluated at query time by each engine's libm, and unlike
  * the bounded-domain fixed-point log tables elsewhere in the repo
  * (entropy, bigram LM) the idf argument's domain is data-dependent
  * (keyed on N and df), so it cannot be pre-tabulated statically. A
  * 1-ulp libm-vs-JVM difference could in principle flip a score that
  * lands within ~1e-16 (relative) of a 6-decimal rounding boundary.
  * This is not left to chance: RetrievalSpec asserts the pinned test
  * corpora keep every emitted score's distance to the nearest rounding
  * boundary orders of magnitude above ulp scale, so the oracle pin is
  * margin-verified, not assumed.
  */
object Retrieval {

  /** Lucene-style BM25 ("+1" idf, always positive): score(d) =
    * Σ_t ln(1 + (N − df + 0.5)/(df + 0.5)) · tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 20): DataFrame =
    bm25Scores(docs, idCol, textCol, queryTerms, k1, b)
      .select(col(idCol), round(col("score_raw"), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)

  /** Every doc with its UNROUNDED BM25 score (`score_raw`) — the
    * margin-audit face of [[bm25TopK]]: RetrievalSpec uses it to assert
    * the pinned corpora keep all scores far from the 6-decimal rounding
    * boundaries the ranked face snaps to (the libm-ulp residual noted in
    * the object scaladoc).
    */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.size <= 32,
      "query terms: 1..32 (per-term columns ride one scan)")
    val base0 = docs.select(col(idCol),
      TextAnalysis.tokens(col(textCol)).as("__toks"))
      .withColumn("dl", size(col("__toks")).cast("double"))
    val base = queryTerms.zipWithIndex.foldLeft(base0) { case (d, (term, i)) =>
      d.withColumn(s"__tf$i",
        size(filter(col("__toks"), _ === lit(term))).cast("double"))
    }.drop("__toks")
    val statCols =
      count(lit(1)).cast("double").as("__n") +:
        (sum(col("dl")) / count(lit(1))).as("__avgdl") +:
        queryTerms.indices.map(i =>
          sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).cast("double")
            .as(s"__df$i"))
    val stats = base.agg(statCols.head, statCols.tail: _*)
    // idf · tf·(k1+1)/(tf + k1·(1−b + b·dl/avgdl)); tf = 0 ⇒ exactly 0.
    def contrib(i: Int): Column =
      log(lit(1.0) + (col("__n") - col(s"__df$i") + lit(0.5)) / (col(s"__df$i") + lit(0.5))) *
        (col(s"__tf$i") * lit(k1 + 1.0) /
          (col(s"__tf$i") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("__avgdl"))))
    val score = queryTerms.indices.map(contrib)
      .reduceLeft(_ + _) // fixed left-to-right association
    base.crossJoin(broadcast(stats))
      .select(col(idCol), score.as("score_raw"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of two ranked lists —
    * the standard hybrid-retrieval combiner: a lexical (BM25) and a
    * semantic (embedding kNN) ranking each nominate top-k candidates,
    * and each candidate scores Σ 1/(kConst + rank) over the lists that
    * ranked it. Computed in exact integer micro-units
    * (`10¹² div (kConst + rank)`, missing rank ⇒ 0), so the fused
    * ordering is engine- and partitioning-exact — no float sum over
    * reciprocals.
    *
    * Inputs are the top-k lists themselves (bounded — both sides of the
    * full outer join hold ≤ k rows no matter the corpus size), each
    * carrying `idCol` and a 1-based rank in `rankCol`. The heavy lifting
    * (scoring 100 TB of text / vectors down to k candidates each) stays
    * in the upstream operators; fusion is a k-row join + one
    * TakeOrderedAndProject.
    */
  /** Maximal Marginal Relevance (Carbonell & Goldstein 1998) — the
    * diversified top-k a retrieval pipeline serves when the plain top-k
    * is a wall of near-duplicates: greedily pick the candidate
    * maximizing λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s), so each
    * pick trades relevance against redundancy with what's already shown.
    *
    * Scale split (the bpeTrain/isotonic discipline): the CORPUS-scale
    * work — scoring every vector against every query and keeping the
    * top `candidates` — is the distributed [[Similarity.bruteForceKnn]]
    * broadcast-scan + bounded-heap pass; the GREEDY loop runs on the
    * collected (queries × candidates) table, driver state
    * O(queries·candidates·dim) behind the explicit `maxDriverRows`
    * fail-fast (enforced with limit(max+1), so the driver never
    * materializes more than the bound either way). The greedy is
    * inherently sequential per query (selection i depends on 1..i−1) —
    * collapsing it to the bounded candidate set is what MMR
    * implementations do at any scale.
    *
    * THE 100 TB KNOB — shard the QUERY set, not maxDriverRows: the
    * greedy is independent PER QUERY (no state crosses query_id), so a
    * query workload that trips the `maxDriverRows` fail-fast splits
    * into batches of queries, each batch one mmrTopK call, results
    * unioned — output identical to the single call BY CONSTRUCTION
    * (RetrievalSpec's shard test pins row equality). Each batch's
    * driver table is (batchQueries × candidates) rows, so the bound
    * becomes a per-batch budget independent of total query count.
    * Raising maxDriverRows instead just moves the OOM; sharding keeps
    * the contract. (The corpus side needs nothing — bruteForceKnnFull
    * re-scans per batch, and for standing workloads the corpus scan is
    * the cost you already pay per query wave.)
    *
    * Determinism contract: relevance is the corpus-side codegen'd
    * cosine; candidate-candidate similarity is computed here with the
    * IDENTICAL sequential association (Σ aᵢ·bᵢ left-to-right, then
    * dot/(√na·√nb) — CosineSimilarity.scala's op order, which the
    * oracle's list_sum/sqrt restates bit-for-bit); the MMR objective is
    * the fixed expression λ·rel − (1−λ)·maxSim with argmax ties broken
    * by ascending id. Output: (query_id, pos, vec_id, mmr_x1e6) with
    * the score floor-quantized (the pca1 floor contract — no
    * rounding-mode ambiguity).
    */
  def mmrTopK(corpus: DataFrame, queries: DataFrame, candidates: Int, k: Int,
      lambda: Double = 0.7, maxDriverRows: Int = 100000): DataFrame = {
    require(candidates >= k && k >= 1,
      s"mmrTopK: need candidates >= k >= 1, got candidates=$candidates k=$k")
    require(lambda > 0.0 && lambda <= 1.0,
      s"mmrTopK: lambda must be in (0, 1], got $lambda")
    val spark = corpus.sparkSession
    val cand = Similarity.bruteForceKnnFull(corpus, queries, candidates)
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("__vec")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("__vec"))
      .limit(maxDriverRows + 1)
    val rows = cand.collect()
    require(rows.length <= maxDriverRows,
      s"mmrTopK: more than $maxDriverRows (queries x candidates) rows — " +
        "the greedy loop's candidate table lives on the driver; lower " +
        "`candidates`, split the query set, or raise maxDriverRows deliberately")
    // the CosineSimilarity.scala association, element-exact
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val nn = math.sqrt(na) * math.sqrt(nb)
      if (nn == 0.0) 0.0 else dot / nn
    }
    final case class Cand(id: Long, rel: Double, vec: Array[Float])
    val byQuery = rows.map { r =>
      (r.getLong(0), Cand(r.getLong(1), r.getDouble(2),
        r.getSeq[Float](3).toArray))
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val out = byQuery.toSeq.sortBy(_._1).flatMap { case (qid, cs) =>
      val selected = scala.collection.mutable.ArrayBuffer.empty[Cand]
      val remaining = scala.collection.mutable.ArrayBuffer(cs: _*)
      (1 to math.min(k, cs.length)).map { pos =>
        var best: Cand = null
        var bestScore = 0.0
        remaining.foreach { c =>
          val score =
            if (selected.isEmpty) c.rel
            else {
              var ms = Double.NegativeInfinity
              selected.foreach { s =>
                val sim = cos(c.vec, s.vec)
                if (sim > ms) ms = sim
              }
              lambda * c.rel - (1.0 - lambda) * ms
            }
          if (best == null || score > bestScore ||
            (score == bestScore && c.id < best.id)) {
            best = c; bestScore = score
          }
        }
        selected += best
        remaining -= best
        (qid, pos.toLong, best.id, math.floor(bestScore * 1e6).toLong)
      }
    }
    import spark.implicits._
    out.toDF("query_id", "pos", "vec_id", "mmr_x1e6")
  }

  def rrfFuse(lex: DataFrame, sem: DataFrame, idCol: String,
      rankCol: String = "rank", kConst: Int = 60, topK: Int = 10): DataFrame = {
    require(kConst > 0 && topK > 0, "kConst and topK must be positive")
    val l = lex.select(col(idCol), col(rankCol).cast("long").as("lex_rank"))
    val s = sem.select(col(idCol), col(rankCol).cast("long").as("sem_rank"))
    l.join(s, Seq(idCol), "full_outer")
      .withColumn("rrf_x1e12",
        coalesce(expr(s"1000000000000 div ($kConst + lex_rank)"), lit(0L)) +
          coalesce(expr(s"1000000000000 div ($kConst + sem_rank)"), lit(0L)))
      .orderBy(col("rrf_x1e12").desc, col(idCol))
      .limit(topK)
  }
}
