package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming near-duplicate detection — the streaming face of
  * `operators.Dedup.minhashNearDups` (same xxhash64 shingle → MinHash →
  * LSH band machinery, bit-identical signatures), for pipelines where
  * documents arrive continuously and "have I seen something like this
  * recently?" must be answered at ingest time, not in a nightly batch
  * sweep.
  *
  * Shape: one map-only signature pass per document (no shuffle), then a
  * single shuffle keyed by (band, bucket-hash) into a
  * `transformWithState` operator whose per-bucket `ListState` holds the
  * (doc_id, signature) of recent arrivals. A new arrival compares
  * against ONLY its bucket's state — the banded-candidate bound of
  * batch LSH, never all-pairs — emits pairs whose signature-estimated
  * Jaccard clears the threshold, and appends itself.
  *
  * At-scale properties:
  *  - State is bounded by `horizon`: each appended entry carries a TTL,
  *    so a bucket retains arrival-rate × horizon docs, not stream
  *    history. Requires the RocksDB backend ([[StateBackend]]) — which
  *    `transformWithState` mandates anyway — so capacity is local disk.
  *  - The per-doc state payload is the signature (numHashes longs),
  *    NOT the text or shingle set: verification is the standard MinHash
  *    estimate (matching components / numHashes, expectation = true
  *    Jaccard). The batch operator with exact shingle verification
  *    remains the reference for offline sweeps; at stream time the
  *    estimate is what a bounded state budget buys.
  *  - A pair colliding in several bands is emitted once per colliding
  *    band (the processor is per-bucket and shares nothing) — run
  *    `.dropDuplicates("a_id", "b_id")` downstream if exact-once pairs
  *    matter; est_jaccard is identical across emissions by construction.
  */
object StreamingDedup {

  final case class NearDupPair(a_id: Long, b_id: Long, est_jaccard: Double, band: Int)

  final case class BucketDoc(doc_id: Long, sig: Array[Long])

  /** `docs`: streaming DataFrame with `doc_id: long`, `text: string`.
    * Emits [[NearDupPair]] rows (a_id < b_id) whose estimated Jaccard is
    * ≥ `minEstJaccard`, comparing each arrival against bucket-mates seen
    * within `horizon`.
    */
  def nearDupPairs(docs: DataFrame, shingleK: Int = 3, numHashes: Int = 16,
      bands: Int = 4, minEstJaccard: Double = 0.6,
      horizon: java.time.Duration = java.time.Duration.ofHours(1)): Dataset[NearDupPair] = {
    import docs.sparkSession.implicits._
    val sh = docs.select(col("doc_id"),
      TextAnalysis.shingleHashes(col("text"), shingleK).as("sh"))
    // shingle-less docs can never clear a threshold > 0 (same pre-drop
    // as the batch operator — they'd otherwise share a sentinel
    // signature and form one corpus-wide hot bucket)
    val banded = sh.filter(size(col("sh")) > 0)
      .select(col("doc_id"),
        graft.functions.SketchFunctions.minhash_sig(col("sh"), numHashes).as("sig"),
        posexplode(graft.functions.SketchFunctions.lsh_bands(col("sh"), numHashes, bands)))
      .select(col("doc_id"), col("sig"), col("pos").as("band"), col("col").as("bh"))
    banded
      .groupByKey(r => (r.getAs[Int]("band"), r.getAs[Long]("bh")))
      .transformWithState(
        new BucketProcessor(numHashes, minEstJaccard, horizon),
        TimeMode.ProcessingTime(),
        OutputMode.Append())
  }

  private class BucketProcessor(numHashes: Int, minEst: Double,
      horizon: java.time.Duration)
      extends StatefulProcessor[(Int, Long), org.apache.spark.sql.Row, NearDupPair] {
    @transient private var seen: ListState[BucketDoc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[BucketDoc]("seen",
        Encoders.product[BucketDoc], TTLConfig(horizon))

    override def handleInputRows(key: (Int, Long),
        rows: Iterator[org.apache.spark.sql.Row],
        timers: TimerValues): Iterator[NearDupPair] = {
      val incoming = rows.map(r =>
        BucketDoc(r.getAs[Long]("doc_id"), r.getAs[scala.collection.Seq[Long]]("sig").toArray))
        .toArray
      val prior = seen.get().toArray
      val out = Seq.newBuilder[NearDupPair]
      var i = 0
      while (i < incoming.length) {
        val d = incoming(i)
        // compare against state AND earlier docs of this same batch —
        // without the intra-batch pass, two copies arriving together
        // would silently miss each other
        val candidates = prior.iterator ++ incoming.iterator.take(i)
        candidates.foreach { p =>
          if (p.doc_id != d.doc_id) {
            var eq = 0; var j = 0
            while (j < numHashes) { if (p.sig(j) == d.sig(j)) eq += 1; j += 1 }
            val est = eq.toDouble / numHashes
            if (est >= minEst)
              out += NearDupPair(math.min(p.doc_id, d.doc_id),
                math.max(p.doc_id, d.doc_id), est, key._1)
          }
        }
        i += 1
      }
      incoming.foreach(seen.appendValue)
      out.result().iterator
    }
  }
}
