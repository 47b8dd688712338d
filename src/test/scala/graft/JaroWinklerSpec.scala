package graft

import graft.functions.JaroWinklerSim
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Jaro-Winkler expression: published vectors, edge cases, codegen parity. */
class JaroWinklerSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerSim.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("published reference vectors") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-9)
  }

  test("edge cases: empties, identity, disjoint, boost threshold") {
    assert(jw("", "") == 0.0)          // DuckDB convention: empty → 0
    assert(jw("", "abc") == 0.0)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("a", "b") == 0.0)        // no matches
    // jaro = 0.444 < 0.7: shared prefix must NOT trigger the boost
    assert(math.abs(jw("aXXXXX", "aYYYYY") - 4.0 / 9.0) < 1e-12)
  }

  test("symmetry and range on random strings") {
    val rnd = new scala.util.Random(3)
    (1 to 500).foreach { _ =>
      val a = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(s == jw(b, a))
    }
  }

  test("column API and SQL registration agree with the static scorer") {
    val df = Seq(("MARTHA", "MARHTA"), ("NATION_1", "NATION_12"), ("", "x"))
      .toDF("a", "b")
    val viaCol = df.select(
      JaroWinklerSim.jaro_winkler(col("a"), col("b")).as("jw"))
      .collect().map(_.getDouble(0)).toSeq
    val expected = Seq(jw("MARTHA", "MARHTA"), jw("NATION_1", "NATION_12"), 0.0)
    assert(viaCol == expected)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)
    org.apache.spark.sql.GraftSqlBridge.registerExtensionFunctions(
      ext, spark.sessionState.functionRegistry)
    df.createOrReplaceTempView("jw_pairs")
    val viaSql = spark.sql("SELECT jaro_winkler(a, b) AS jw FROM jw_pairs")
      .collect().map(_.getDouble(0)).toSeq
    assert(viaSql == expected)
  }

  test("null propagation") {
    val df = Seq((Some("x"), None: Option[String]), (None, Some("y")))
      .toDF("a", "b")
    val out = df.select(JaroWinklerSim.jaro_winkler(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }
}
