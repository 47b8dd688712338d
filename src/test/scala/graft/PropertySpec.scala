package graft

import graft.operators.{Transforms, Validation}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated property tests (SURVEY.md §5): quality-score
  * trichotomy, between-expectation null handling, and sha2/reference hash
  * parity over arbitrary inputs. Generators are driven directly with a
  * fixed seed (the scalatest-scalacheck bridge isn't on the offline
  * classpath), so failures are reproducible.
  */
class PropertySpec extends SparkSpec {

  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  test("quality score is a total trichotomy over any battery/null combination") {
    val gen = for {
      battery <- Gen.chooseNum(-10.0, 120.0)
      tempNull <- Gen.oneOf(true, false)
      humNull <- Gen.oneOf(true, false)
      aqiNull <- Gen.oneOf(true, false)
    } yield (battery, tempNull, humNull, aqiNull)
    val cases = sample(Gen.listOfN(300, gen), 42L)

    val df = cases.map { case (b, tn, hn, an) =>
      (b, if (tn) None else Some(1.0), if (hn) None else Some(1.0),
        if (an) None else Some(1.0))
    }.toDF("battery", "temp", "hum", "aqi")
    val got = df.select(col("battery"), col("temp"), col("hum"), col("aqi"),
      Transforms.qualityScore(col("battery"), col("temp"), col("hum"), col("aqi"))
        .as("q")).collect()
    assert(got.length == 300)
    got.foreach { r =>
      val b = r.getDouble(0)
      val allPresent = !r.isNullAt(1) && !r.isNullAt(2) && !r.isNullAt(3)
      val expected =
        if (b >= 50 && allPresent) "PASS" else if (b >= 20) "WARN" else "FAIL"
      assert(r.getString(4) == expected, s"row $r")
    }
  }

  test("between expectation: null rows never count as out-of-range") {
    (1L to 5L).foreach { seed =>
      val vs = sample(Gen.listOfN(100, Gen.option(Gen.chooseNum(-100.0, 200.0))), seed)
      val df = vs.toDF("x")
      val r = Validation.validate(df, "t", Seq(Validation.Between("x", 0, 100)))
      val expectedOor = vs.count(v => v.exists(d => d < 0 || d > 100))
      assert(r.results.head.details("out_of_range_count") == expectedOor.toLong,
        s"seed=$seed vs=$vs")
    }
  }

  test("sha2 matches java MessageDigest for arbitrary strings") {
    val ss = sample(Gen.listOfN(100, Gen.asciiPrintableStr), 7L).distinct
    val got = ss.toDF("s")
      .select(col("s"), Transforms.pseudonymize(col("s")))
      .as[(String, String)].collect().toMap
    val md = java.security.MessageDigest.getInstance("SHA-256")
    ss.foreach { s =>
      val expected = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(got(s) == expected)
    }
  }
}
