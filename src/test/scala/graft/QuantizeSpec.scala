package graft

import graft.operators.Quantize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Int8 min-max quantization: hand-computed codes, round-trip error
  * bound, degenerate dimensions.
  */
class QuantizeSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val vecs = Seq(
    (1L, Seq(0.0f, 10.0f, 7.0f)),
    (2L, Seq(5.0f, 10.0f, 7.0f)),
    (3L, Seq(10.0f, 20.0f, 7.0f))).toDF("vec_id", "embedding")

  test("hand-computed codes; degenerate dimension codes to -128") {
    val st = Quantize.int8Stats(vecs, "embedding")
    val got = Quantize.int8Encode(vecs, "vec_id", "embedding", st)
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    // dim0 [0,10]: 0→-128, 5→round(127.5)=128→0, 10→127
    // dim1 [10,20]: 10→-128, 10→-128, 20→127
    // dim2 constant 7: always -128
    assert(got(1L) == Seq[Byte](-128, -128, -128))
    assert(got(2L) == Seq[Byte](0, -128, -128))
    assert(got(3L) == Seq[Byte](127, 127, -128))
  }

  test("round-trip error within (mx-mn)/510 per dimension; constant dim exact") {
    val rnd = new scala.util.Random(7)
    val df = (0L until 200L).map(i =>
        (i, Seq.fill(16)(rnd.nextFloat() * 4f - 2f) :+ 3.5f))
      .toDF("vec_id", "embedding")
    val st = Quantize.int8Stats(df, "embedding")
    val codes = Quantize.int8Encode(df, "vec_id", "embedding", st)
    val recon = Quantize.int8Decode(codes, "id", "codes", st)
    val joined = df.select(col("vec_id").as("id"), col("embedding"))
      .join(recon, "id")
      .select(col("id"), expr(
        """aggregate(zip_with(embedding, vec,
          |  (a, b) -> abs(CAST(a AS DOUBLE) - b)), 0.0D, (acc, x) -> greatest(acc, x))"""
          .stripMargin).as("maxerr"),
        // last dim is constant 3.5 → must reconstruct exactly
        abs(element_at(col("vec"), 17) - lit(3.5f).cast("double")).as("consterr"))
      .agg(max(col("maxerr")).as("worst"), max(col("consterr")).as("constworst"))
      .collect().head
    // range is ~4 → bound ~4/510; allow float-cast slack
    assert(joined.getDouble(0) <= 4.2 / 510 + 1e-6)
    assert(joined.getDouble(1) <= 1e-7)
  }

  test("codes invariant under repartitioning") {
    val st = Quantize.int8Stats(vecs, "embedding")
    val a = Quantize.int8Encode(vecs, "vec_id", "embedding", st)
      .orderBy("id").collect().map(_.getSeq[Byte](1)).toSeq
    val st2 = Quantize.int8Stats(vecs.repartition(5), "embedding")
    val b = Quantize.int8Encode(vecs.repartition(3), "vec_id", "embedding", st2)
      .orderBy("id").collect().map(_.getSeq[Byte](1)).toSeq
    assert(a == b)
  }
}
