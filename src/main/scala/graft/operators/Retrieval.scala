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
