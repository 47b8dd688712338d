package graft

import graft.functions.{CosineSimilarity, HeavyHittersAgg, JaccardSim,
  JaroWinklerSim, KmvSketchAgg, LshBands, MinHashSig, SimHash64, TDigestAgg,
  WinnowFingerprints, WordShingleHashes, WordShingles}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * expressions as SQL functions, so any session started with
  *   --conf spark.sql.extensions=graft.GraftExtensions
  * (or `.withExtensions(new GraftExtensions)`) can call them from SQL:
  *
  *   SELECT cosine_sim(a.embedding, b.embedding) FROM ...
  *   SELECT minhash_sig(word_shingles(tokens, 3), 16) ...
  *   SELECT simhash64(tokens) ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects an integer literal, got $other")
  }

  private def doubleArg(e: Expression, name: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: Int, _) => v.toDouble
    // SQL `0.5` parses as a DECIMAL literal, not DOUBLE
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$name expects a numeric literal, got $other")
  }

  /** Positional indexing without an arity check turns a mis-called SQL
    * function into an IndexOutOfBoundsException; fail with the expected
    * signature instead.
    */
  private def arity(exprs: Seq[Expression], n: Int, sig: String): Seq[Expression] = {
    if (exprs.length != n) throw new IllegalArgumentException(
      s"wrong argument count: expected $sig, got ${exprs.length} argument(s)")
    exprs
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // jaccard_sim(A,B) >= t over provably-distinct sets gains a cheap
    // size-ratio prefilter (see the rule's soundness guards)
    ext.injectOptimizerRule(_ => graft.plans.JaccardPrefilterRule)
    // opt-in automatic bucketed range join (spark.graft.rangeJoin.bucketWidth)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
    // planner strategy for the custom skyline logical operator
    ext.injectPlannerStrategy(_ => graft.plans.SkylineStrategy)
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 2, "cosine_sim(vec1, vec2)")
        CosineSimilarity(e(0), e(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 2, "minhash_sig(shingles, numHashes)")
        MinHashSig(e(0), intArg(e(1), "minhash_sig numHashes"))
      }))
    ext.injectFunction((
      FunctionIdentifier("lsh_bands"),
      new ExpressionInfo(classOf[LshBands].getName, "lsh_bands"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 3, "lsh_bands(shingles, numHashes, bands)")
        LshBands(e(0), intArg(e(1), "lsh_bands numHashes"),
          intArg(e(2), "lsh_bands bands"))
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 1, "simhash64(tokens)")
        SimHash64(e(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 2, "word_shingles(tokens, k)")
        WordShingles(e(0), intArg(e(1), "word_shingles k"))
      }))
    ext.injectFunction((
      FunctionIdentifier("word_shingle_hashes"),
      new ExpressionInfo(classOf[WordShingleHashes].getName, "word_shingle_hashes"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 2, "word_shingle_hashes(tokens, k)")
        WordShingleHashes(e(0), intArg(e(1), "word_shingle_hashes k"))
      }))
    ext.injectFunction((
      FunctionIdentifier("jaccard_sim"),
      new ExpressionInfo(classOf[JaccardSim].getName, "jaccard_sim"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 2, "jaccard_sim(set1, set2)")
        JaccardSim(e(0), e(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSim].getName, "jaro_winkler"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 2, "jaro_winkler(str1, str2)")
        JaroWinklerSim(e(0), e(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 3, "winnow_fingerprints(text, k, w)")
        WinnowFingerprints(e(0),
          intArg(e(1), "winnow_fingerprints k"), intArg(e(2), "winnow_fingerprints w"))
      }))
    ext.injectFunction((
      FunctionIdentifier("heavy_hitters"),
      new ExpressionInfo(classOf[HeavyHittersAgg].getName, "heavy_hitters"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 2, "heavy_hitters(item, k)")
        HeavyHittersAgg(e(0), intArg(e(1), "heavy_hitters k"))
          .toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketchAgg].getName, "kmv_sketch"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 2, "kmv_sketch(value, k)")
        KmvSketchAgg(e(0), intArg(e(1), "kmv_sketch k"))
          .toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("tdigest_quantile"),
      new ExpressionInfo(classOf[TDigestAgg].getName, "tdigest_quantile"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 2, "tdigest_quantile(value, p)")
        TDigestAgg(e(0), Seq(doubleArg(e(1), "tdigest_quantile p")))
          .toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("count_min"),
      new ExpressionInfo(classOf[graft.functions.CountMinAgg].getName, "count_min"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 4,
          "count_min(item, width, depth, array('q1', 'q2', ...))")
        graft.functions.CountMinAgg(e(0),
          intArg(e(1), "count_min width"), intArg(e(2), "count_min depth"),
          stringArrayArg(e(3), "count_min queryItems"))
          .toAggregateExpression()
      }))
  }

  /** A SQL `array('a', 'b', ...)` of string literals (or a foldable
    * array literal) as Seq[String]; anything else fails with the
    * expected shape.
    */
  private def stringArrayArg(e: Expression, name: String): Seq[String] = e match {
    case arr if arr.foldable &&
        arr.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
        arr.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
          .elementType == org.apache.spark.sql.types.StringType =>
      val data = arr.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      (0 until data.numElements()).map { i =>
        if (data.isNullAt(i)) throw new IllegalArgumentException(
          s"$name expects array('item', ...) of string literals — element $i is NULL")
        data.getUTF8String(i).toString
      }
    case other => throw new IllegalArgumentException(
      s"$name expects array('item', ...) of string literals, got $other")
  }
}
