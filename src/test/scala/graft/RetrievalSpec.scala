package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval: scores vs a naive in-memory recomputation,
  * ranking sanity, and the bounded top-k plan shape.
  */
class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  private val corpus = Seq(
    (1L, "cat cat cat dog"),
    (2L, "cat dog fish"),
    (3L, "dog dog dog dog dog dog dog dog"),
    (4L, "fish"),
    (5L, "bird bird cat"),
    (6L, "")
  ).toDF("doc_id", "text")

  private def naive(terms: Seq[String], k1: Double, b: Double): Map[Long, Double] = {
    val docs = Seq(
      1L -> Seq("cat", "cat", "cat", "dog"),
      2L -> Seq("cat", "dog", "fish"),
      3L -> Seq.fill(8)("dog"),
      4L -> Seq("fish"),
      5L -> Seq("bird", "bird", "cat"),
      6L -> Seq.empty[String])
    val n = docs.size.toDouble
    val avgdl = docs.map(_._2.size).sum.toDouble / docs.size
    docs.map { case (id, toks) =>
      val dl = toks.size.toDouble
      val score = terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        val df = docs.count(_._2.contains(t)).toDouble
        math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
          (tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * dl / avgdl)))
      }.reduceLeft(_ + _)
      id -> BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  test("bm25TopK == naive recomputation, bit-for-bit after rounding") {
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text",
        Seq("cat", "dog"), topK = 10)
      .as[(Long, Double)].collect().toMap
    val want = naive(Seq("cat", "dog"), 1.2, 0.75)
    assert(got.keySet == want.keySet.filter(id => want(id) != 0.0 || true))
    got.foreach { case (id, s) => assert(s == want(id), s"doc $id") }
  }

  test("rare terms dominate: a unique term outranks a everywhere-term") {
    // 'fish' (df=2) discriminates; 'cat' (df=3) less so; doc 4 is pure fish
    val top = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("fish"), topK = 1)
      .as[(Long, Double)].collect().head
    assert(top._1 == 4L) // shortest doc with the term ranks first
  }

  test("topK bounds the output; zero-hit docs score exactly 0 and sort by id") {
    val rows = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("bird"), topK = 4)
      .as[(Long, Double)].collect()
    assert(rows.length == 4)
    assert(rows.head._1 == 5L)
    val zeros = rows.filter(_._2 == 0.0).map(_._1)
    assert(zeros.sameElements(zeros.sorted)) // id tiebreak on equal scores
  }

  test("oracle margin: pinned corpora keep every score far from a 6-decimal rounding boundary") {
    // ret1's determinism rests on round(score, 6) landing identically on
    // both engines despite libm-vs-JVM ln. That holds as long as no raw
    // score sits within ulp range (~1e-16 relative) of a x.5e-6 rounding
    // boundary. Assert the margin on the actual ret1 query (same terms,
    // same corpus) at both pinned SFs — margin-verified, not assumed.
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val raw = Retrieval.bm25Scores(docs, "doc_id", "text",
        Seq("dup", "spark", "window", "merge"), 1.2, 0.75)
      val minMargin = raw
        .select(min(abs(col("score_raw") * 1e6 -
          floor(col("score_raw") * 1e6) - 0.5)).as("m"))
        .as[Double].head()
      // Threshold calibration: a 1-ulp ln() difference propagates to at
      // most ~4e-15 absolute on a summed 4-term score of O(1..10), i.e.
      // ~4e-9 micro-units. 1e-6 micro-units (1e-12 absolute) leaves 250x
      // headroom above that while tolerating the genuinely tight-but-safe
      // margins real corpora produce (observed 1.6e-4 at sf0.01).
      assert(minMargin > 1e-6,
        s"$sf: a BM25 score sits within $minMargin micro-units of a rounding " +
          "boundary — the ret1 oracle pin is at ulp risk; adjust terms or corpus")
    }
  }

  test("plan: bounded top-k (TakeOrderedAndProject), no wide shuffle on the scan side") {
    val plan = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("cat"), topK = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("mmrTopK: diversity demotes the near-duplicate; lambda=1 is pure relevance") {
    // query (1,0); candidate 1 = (100,1) near-parallel to 3 = (100,2),
    // candidate 2 = (1,2) much less relevant but diverse. At a
    // diversity-heavy lambda the redundant 3 drops below 2; at
    // lambda = 1 the MMR objective degenerates to relevance order.
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(100f, 1f)),
      (2L, Array(1f, 2f)), (3L, Array(100f, 2f))
    ).toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 0)
    def picks(lambda: Double): Seq[Long] =
      Retrieval.mmrTopK(vecs, q, candidates = 3, k = 3, lambda = lambda)
        .orderBy("pos").select("vec_id").as[Long].collect().toSeq
    assert(picks(0.3) == Seq(1L, 2L, 3L),
      "diversity weight must pull the non-duplicate ahead of the near-copy")
    assert(picks(1.0) == Seq(1L, 3L, 2L),
      "lambda = 1 must reproduce the pure relevance ranking")
    // first pick's score is the floor-quantized relevance itself
    val first = Retrieval.mmrTopK(vecs, q, candidates = 3, k = 3, lambda = 0.3)
      .filter(col("pos") === 1).select("mmr_x1e6").as[Long].head()
    val rel = 100.0 / (math.sqrt(1.0) * math.sqrt(100.0 * 100.0 + 1.0))
    assert(first == math.floor(rel * 1e6).toLong)
  }

  test("mmrTopK sharding the query set batch-by-batch equals the single call row-for-row") {
    // the documented 100 TB escape hatch for the maxDriverRows bound:
    // the greedy never crosses query_id, so batches of queries union to
    // the identical output — pinned here on a 6-query / 2-batch split
    val corpus = (0L to 40L).map(i =>
        (i, Array((i % 7).toFloat + 1f, (i % 5).toFloat, (i % 3).toFloat)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 6)
    val whole = Retrieval.mmrTopK(corpus, queries, candidates = 8, k = 4)
      .orderBy("query_id", "pos").collect().toSeq
    val batchA = Retrieval.mmrTopK(corpus,
      queries.filter(col("vec_id") < 3), candidates = 8, k = 4,
      maxDriverRows = 24)
    val batchB = Retrieval.mmrTopK(corpus,
      queries.filter(col("vec_id") >= 3), candidates = 8, k = 4,
      maxDriverRows = 24)
    val sharded = batchA.unionAll(batchB)
      .orderBy("query_id", "pos").collect().toSeq
    assert(sharded == whole,
      "per-batch greedy must reproduce the single-call output exactly")
  }

  test("mmrTopK fail-fasts: driver-row bound, bad lambda, k > candidates") {
    val vecs = (0L to 30L).map(i => (i, Array(i.toFloat, 1f)))
      .toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException](Retrieval.mmrTopK(
      vecs, vecs.limit(5), candidates = 10, k = 3, maxDriverRows = 20))
    assert(e1.getMessage.contains("more than 20"))
    val e2 = intercept[IllegalArgumentException](
      Retrieval.mmrTopK(vecs, vecs, candidates = 10, k = 3, lambda = 0.0))
    assert(e2.getMessage.contains("lambda"))
    val e3 = intercept[IllegalArgumentException](
      Retrieval.mmrTopK(vecs, vecs, candidates = 2, k = 3))
    assert(e3.getMessage.contains("candidates >= k"))
  }
}
