package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection for LM training corpora.
  *
  * DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  * score every raw document by how much more likely its hashed-n-gram
  * bag is under a TARGET corpus' unigram bucket distribution than under
  * the RAW corpus' — the log-likelihood ratio
  * Σ_tokens [ln θ_t(h(tok)) − ln θ_r(h(tok))] with add-one smoothing —
  * then keep the top-scoring documents. This is the standard
  * cheap-feature alternative to model-based quality filtering: the
  * "model" is two bucket histograms, trainable in one aggregation pass
  * over the corpus.
  *
  * (cf. the reference's quality gating, scripts/glue_transform/
  * transform.py:61-76, which scores rows with fixed CASE rules; DSIR
  * learns the scoring from an exemplar corpus instead.)
  *
  * Determinism at scale: the per-bucket log-ratio is rounded to
  * MICRO-units and cast to long ONCE (in the tiny model relation), so
  * the per-document score is an INTEGER dot product n·slr — associative
  * and exact under any partitioning, unlike a per-token double sum whose
  * value depends on reduction order. Bucket hashing is md5-based
  * ([[Sampling.hashValue]] idiom) so external systems can reproduce it.
  *
  * Plan shape: one explode + two keyed aggregations (bucket counts for
  * the model; (doc, bucket) counts for scoring) + a BROADCAST join of
  * the model (≤ `buckets` rows — bounded by construction, never corpus-
  * sized). No all-pairs anything; every stage map-side combines. At
  * 100 TB the only corpus-sized shuffles are the two partial-agg
  * groupBys.
  */
object Selection {

  /** Per-document DSIR log-likelihood-ratio score, in micro-units
    * (score_micro = round(Σ ln-ratio · 1e6)), plus the `selected` flag
    * (score_micro > 0 ⇔ the document looks more target- than raw-like).
    * Documents with zero tokens carry no evidence and are omitted.
    *
    * @param isTarget marks rows of the exemplar (target) corpus; all
    *                 rows — target and raw — are scored.
    */
  def dsirScore(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 65536, salt: String = "dsir"): DataFrame = {
    require(buckets > 0, s"dsirScore: buckets must be positive, got $buckets")
    // widen the 3-column projection before the tokenize/md5 explode
    // (heavy narrow map over a possibly single-split scan — see
    // Rounds.widen; both consumers below share the one exchange)
    val tb = Rounds.widen(docs
      .select(col(idCol).as("id"), isTarget.as("tgt"), col(textCol)))
      .select(col("id"), col("tgt"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .withColumn("bucket",
        conv(substring(md5(concat(col("tok"), lit(salt))), 1, 8), 16, 10)
          .cast("long") % buckets)
    val cnt = tb.groupBy("bucket").agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
      sum(when(col("tgt"), 0L).otherwise(1L)).as("cr"))
    val tot = cnt.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    // ln((ct+1)/(tt+B) / ((cr+1)/(tr+B))) — one division per density,
    // one ln, mirrored op-for-op by the DuckDB oracle; micro-rounded to
    // a long so downstream sums are exact integers.
    val model = cnt.crossJoin(broadcast(tot)).select(col("bucket"),
      round(log(
        ((col("ct") + lit(1.0)) / (col("tt") + lit(buckets.toDouble))) /
          ((col("cr") + lit(1.0)) / (col("tr") + lit(buckets.toDouble)))) * lit(1e6), 0)
        .cast("long").as("slr"))
    tb.groupBy("id", "bucket").agg(count(lit(1)).as("n"))
      .join(broadcast(model), "bucket")
      .groupBy("id").agg(sum(col("n") * col("slr")).as("score_micro"))
      .select(col("id"), col("score_micro"),
        (col("score_micro") > 0).as("selected"))
  }
}
