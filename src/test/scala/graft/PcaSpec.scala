package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

/** Fixed-point Gram matrix + power iteration: exactness vs a naive
  * in-memory computation, partitioning invariance, and that the result
  * is genuinely the dominant eigendirection.
  */
class PcaSpec extends SparkSpec {

  import spark.implicits._

  // deterministic 8-dim vectors with a planted dominant direction e0+e1
  private val vecs: Seq[(Long, Array[Float])] = (0 until 200).map { i =>
    val r = new scala.util.Random(i)
    val base = Array.fill(8)((r.nextDouble() - 0.5) * 0.1)
    val strength = (i % 10).toDouble / 10.0
    base(0) += strength * 0.8
    base(1) += strength * 0.8
    (i.toLong, base.map(_.toFloat))
  }

  private def df = vecs.toDF("vec_id", "embedding")

  test("gramMatrix == naive floor-quantized sum of outer products") {
    val (g, n) = Pca.gramMatrix(df, "embedding", dim = 8, scale = 10000)
    assert(n == 200L)
    val naive = Array.fill(64)(0L)
    vecs.foreach { case (_, v) =>
      val q = v.map(x => math.floor(x.toDouble * 10000).toLong)
      for (i <- 0 until 8; j <- 0 until 8) naive(i * 8 + j) += q(i) * q(j)
    }
    assert(g.sameElements(naive))
  }

  test("gramMatrix is partitioning-invariant (exact integers merge associatively)") {
    val (a, _) = Pca.gramMatrix(df.repartition(1), "embedding", 8)
    val (b, _) = Pca.gramMatrix(df.repartition(17, col("vec_id")), "embedding", 8)
    assert(a.sameElements(b))
  }

  test("topComponent aligns with the dominant eigendirection (planted e0+e1)") {
    val v = Pca.topComponent(df, "embedding", dim = 8)
      .orderBy("dim").as[(Int, Long)].collect().map(_._2.toDouble)
    val norm = math.sqrt(v.map(x => x * x).sum)
    val unit = v.map(_ / norm)
    // planted direction (1,1,0,...)/√2: cosine must be ≈ 1
    val cos = (unit(0) + unit(1)) / math.sqrt(2.0)
    assert(cos > 0.99, s"cosine with planted direction was $cos")
    // sign convention: pivot coordinate positive
    assert(v.map(math.abs).max == v.max)
  }

  test("topComponent: empty input yields an empty frame; null vectors are skipped") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Pca.topComponent(empty, "embedding", 8).count() == 0L)
    val withNull = (vecs.map { case (id, v) => (id, Option(v)) } :+
      ((999L, Option.empty[Array[Float]]))).toDF("vec_id", "embedding")
    val a = Pca.topComponent(withNull, "embedding", 8).as[(Int, Long)].collect()
    val b = Pca.topComponent(df, "embedding", 8).as[(Int, Long)].collect()
    assert(a.sameElements(b))
  }
}
