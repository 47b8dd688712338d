package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), with an exact brute-force baseline and an IVF-style
  * scale path.
  *
  * Shuffle shapes at 100 TB:
  *  - brute force is a broadcast of the (small) query set against the
  *    full corpus — one scan, no corpus shuffle, TakeOrdered per query;
  *  - IVF assigns every vector to its nearest centroid once (broadcast of
  *    centroids, narrow map), then probes only `nprobe` cells per query —
  *    the candidate join is keyed on cell id, shrinking compared pairs by
  *    ~cells/nprobe.
  */
object Similarity {

  /** Elementwise float→double view of an embedding. */
  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product via zip_with + aggregate — sequential left-to-right fold,
    * deterministic, no UDF. Kept as the reference implementation the
    * native expression is tested against.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine via built-in higher-order functions — identical semantics to
    * `cosine`, ~an order of magnitude slower (three intermediate arrays +
    * interpreted lambdas). Used only to cross-check the native expression.
    */
  def cosineHof(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n === 0, lit(0.0)).otherwise(d / n)
  }

  /** Cosine similarity; 0.0 when either vector has zero norm. One fused
    * codegen'd loop (graft.functions.CosineSimilarity).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosine_sim(a, b)

  /** Top-k per key via the bounded-heap aggregate
    * (graft.functions.TopKAgg): map-side partial top-k means each mapper
    * ships at most k skinny rows per key — unlike a row_number window,
    * which shuffles and sorts EVERY scored row. Output: (key, rank, id,
    * score), rank 1 = best, ordered score DESC then id ASC.
    */
  def topKPerKey(scored: DataFrame, keyCol: String, score: Column, id: Column,
      k: Int): DataFrame =
    scored.groupBy(col(keyCol))
      .agg(graft.functions.TopKFunctions.top_k(score, id, k).as("__tk"))
      .select(col(keyCol), posexplode(col("__tk")))
      .select(col(keyCol), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("id"), col("col.score").as("score"))

  /** Exact brute-force top-k cosine neighbors for each query vector.
    * `queries` is expected to be small (it is broadcast); the corpus is
    * scanned once, and only ≤k rows per (query, mapper) reach the shuffle
    * thanks to the partial top-k aggregate. Self-matches excluded.
    */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_vec")))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_vec"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("q_vec"), col("c_vec")).as("cosine"))
    topKPerKey(scored, "query_id", col("cosine"), col("neighbor_id"), k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"),
        round(col("score"), 6).as("cosine"))
  }

  /** Random-hyperplane LSH bucket id: sign bits of `planes` deterministic
    * pseudo-random hyperplanes. Plane p's component for dimension i is
    * derived from xxhash64(p, i) — reproducible across runs and engines
    * with no stored model.
    */
  def hyperplaneLsh(v: Column, planes: Int): Column = {
    val dims = size(v)
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(asDouble(v), sequence(lit(0), dims - 1),
          (x, i) => x * (pmod(xxhash64(lit(p), i), lit(2000001L)).cast("double") / 1000000.0 - 1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(0L)
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** IVF-style ANN: k-means-free variant using centroid rows sampled
    * deterministically from the corpus. The centroid "model" is tiny by
    * construction, so it is collected once and re-enters the plan as
    * literals: corpus cell assignment becomes a MAP-ONLY argmax over the
    * broadcast centroids — no crossJoin, no aggregation, and the corpus
    * embeddings are never shuffled for assignment. Each query probes its
    * `nprobe` nearest cells and ranks only those cells' members.
    */
  def ivfKnn(corpus: DataFrame, queries: DataFrame, k: Int,
      numCentroids: Int = 16, nprobe: Int = 4): DataFrame = {
    require(numCentroids >= 2, "need at least 2 centroids")
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents: Seq[(Long, Seq[Float])] = corpus.orderBy("vec_id").limit(numCentroids)
      .select(col("vec_id"), col("embedding"))
      .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Float](1)))

    val corpusV = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_vec"))
    val queriesV = broadcast(
      queries.select(col("vec_id").as("query_id"), col("embedding").as("q_vec")))

    // max of struct(score, -id) == (score DESC, id ASC) — identical
    // ordering to the top-1 bounded heap the query side uses.
    val argmaxCell = -greatest(cents.map { case (cid, v) =>
      struct(cosine(col("c_vec"), typedlit(v)).as("cs"), lit(-cid).as("neg_id")) }: _*)
      .getField("neg_id")
    val assigned = corpusV.withColumn("cell", argmaxCell)

    val centroids = broadcast(
      cents.toDF("centroid_id", "cent_vec"))
    val probed = topKPerKey(
      queriesV.crossJoin(centroids)
        .select(col("query_id"), col("centroid_id"),
          cosine(col("q_vec"), col("cent_vec")).as("cs")),
      "query_id", col("cs"), col("centroid_id"), nprobe)
      .select(col("query_id"), col("id").as("cell"))
      .join(queriesV, "query_id")

    val scored = probed.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("q_vec"), col("c_vec")).as("cosine"))
    topKPerKey(scored, "query_id", col("cosine"), col("neighbor_id"), k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"),
        round(col("score"), 6).as("cosine"))
  }
}
