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

  test("projectTop == naive dot of quantized vectors with the component") {
    val comp = Pca.topComponent(df, "embedding", dim = 8)
      .orderBy("dim").as[(Int, Long)].collect().map(_._2)
    val got = Pca.projectTop(df, "vec_id", "embedding", dim = 8)
      .as[(Long, Long)].collect().toMap
    vecs.foreach { case (id, v) =>
      val q = v.map(x => math.floor(x.toDouble * 10000).toLong)
      val want = q.zip(comp).map { case (a, b) => a * b }.sum
      assert(got(id) == want, s"vec $id")
    }
    // planted-direction sanity: projection grows with planted strength
    val byStrength = vecs.groupBy(_._1 % 10).view
      .mapValues(g => g.map(r => got(r._1)).sum.toDouble / g.size)
    assert(byStrength(9L) > byStrength(0L))
  }

  test("correlationMatrix: perfect/anti/constant columns, symmetric, unit diagonal") {
    import graft.operators.Profile
    val rows = (1 to 50).map { i =>
      (i.toDouble, i * 2.0, 100.0 - i, 7.0, (i % 5).toDouble)
    }
    val df = rows.toDF("a", "b2", "neg", "const", "mod")
    val m = Profile.correlationMatrix(df, Seq("a", "b2", "neg", "const", "mod"), scale = 100)
      .as[(Long, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(m((0L, 0L)).contains(1.0))
    assert(m((0L, 1L)).contains(1.0))   // b = 2a: perfectly correlated
    assert(m((0L, 2L)).contains(-1.0))  // neg = 100 - a
    assert(m((0L, 3L)).isEmpty)         // constant column: null, not 0
    assert(m((3L, 3L)).isEmpty)
    // symmetry
    for (i <- 0L until 5L; j <- 0L until 5L) assert(m((i, j)) == m((j, i)))
    // against scala.util pearson on the quantized values
    val qa = rows.map(r => math.floor(r._1 * 100))
    val qm = rows.map(r => math.floor(r._5 * 100))
    val n = qa.size.toDouble
    val (sa, sm) = (qa.sum, qm.sum)
    val (saa, smm, sam) = (qa.map(x => x * x).sum, qm.map(x => x * x).sum,
      qa.zip(qm).map(p => p._1 * p._2).sum)
    val want = BigDecimal((n * sam - sa * sm) /
      (math.sqrt(n * saa - sa * sa) * math.sqrt(n * smm - sm * sm)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m((0L, 4L)).contains(want))
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
