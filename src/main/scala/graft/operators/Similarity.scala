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

  /** Exact brute-force top-k cosine neighbors for each query vector.
    * `queries` is expected to be small (it is broadcast); the corpus is
    * only scanned, never shuffled. Self-matches excluded when ids collide.
    */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_vec")))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_vec"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
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

  /** IVF-style ANN: k-means-free variant using `centroids` rows sampled
    * deterministically from the corpus (every `stride`-th vector). Each
    * corpus vector is assigned to its nearest centroid (one broadcast
    * join + TakeOrdered per vector); each query probes the `nprobe`
    * nearest cells and ranks only those cells' members.
    */
  def ivfKnn(corpus: DataFrame, queries: DataFrame, k: Int,
      numCentroids: Int = 16, nprobe: Int = 4): DataFrame = {
    val centroids = broadcast(
      corpus.orderBy("vec_id").limit(numCentroids)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cent_vec")))

    def assign(df: DataFrame, idCol: String, vecCol: String, keep: Int): DataFrame = {
      val w = Window.partitionBy(idCol).orderBy(
        cosine(col(vecCol), col("cent_vec")).desc, col("centroid_id"))
      df.crossJoin(centroids)
        .withColumn("cell_rank", row_number().over(w))
        .filter(col("cell_rank") <= keep)
        .drop("cent_vec", "cell_rank")
    }

    val assigned = assign(
      corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_vec")),
      "neighbor_id", "c_vec", keep = 1)
      .withColumnRenamed("centroid_id", "cell")
    val probed = assign(
      broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))),
      "query_id", "q_vec", keep = nprobe)
      .withColumnRenamed("centroid_id", "cell")

    val scored = probed.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }
}
