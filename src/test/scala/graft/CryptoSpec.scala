package graft

import graft.operators.Crypto
import org.apache.spark.sql.functions._

/** Column-level encryption semantics: round-trip identity, wrong-key
  * behavior, GCM freshness vs deterministic stability, and equality
  * joinability on deterministic ciphertext.
  */
class CryptoSpec extends SparkSpec {

  import spark.implicits._

  private val key = "0123456789abcdef"
  private val df = Seq(
    (1L, "alice", "555-0101"), (2L, "bob", "555-0102"),
    (3L, "alice", "555-0101"), (4L, "dörte ünïcode", "+49 30 1234"))
    .toDF("id", "name", "phone")

  test("GCM and deterministic round-trips restore every value exactly") {
    for (det <- Seq(false, true)) {
      val back = Crypto.decryptColumns(
        Crypto.encryptColumns(df, Seq("name", "phone"), key, det),
        Seq("name", "phone"), key, det)
        .orderBy("id").as[(Long, String, String)].collect().toSeq
      assert(back == df.orderBy("id").as[(Long, String, String)].collect().toSeq,
        s"deterministic=$det round-trip must be identity (incl. unicode)")
    }
  }

  test("ciphertext is not cleartext; GCM is fresh per evaluation, ECB stable") {
    val enc = Crypto.encryptColumns(df, Seq("name"), key)
    assert(enc.filter(col("name").isin("alice", "bob")).count() == 0)
    // two independent GCM encryptions of the same value differ (random
    // IV). NB: two identical aes_encrypt calls in ONE projection are
    // merged by common-subexpression elimination — independence needs
    // two separate plan evaluations, hence the self-join.
    val g1 = Crypto.encryptColumns(df, Seq("name"), key)
      .select(col("id"), col("name").as("a"))
    val g2 = Crypto.encryptColumns(df, Seq("name"), key)
      .select(col("id"), col("name").as("b"))
    assert(g1.join(g2, "id").filter(col("a") === col("b")).count() == 0,
      "GCM IV must be fresh across evaluations")
    // deterministic mode: independent encryptions are identical
    val d1 = Crypto.encryptColumns(df, Seq("name"), key, deterministic = true)
      .select(col("id"), col("name").as("n1"))
    val d2 = Crypto.encryptColumns(df, Seq("name"), key, deterministic = true)
      .select(col("id"), col("name").as("n2"))
    assert(d1.join(d2, "id").filter(col("n1") =!= col("n2")).count() == 0)
  }

  test("deterministic ciphertext preserves equality joins; GCM destroys them") {
    def selfPairs(enc: org.apache.spark.sql.DataFrame): Long = {
      val a = enc.select(col("id").as("ia"), col("name").as("na"))
      val b = enc.select(col("id").as("ib"), col("name").as("nb"))
      a.join(b, col("na") === col("nb") && col("ia") < col("ib")).count()
    }
    assert(selfPairs(df) == 1) // the two alices
    assert(selfPairs(Crypto.encryptColumns(df, Seq("name"), key,
      deterministic = true)) == 1, "ECB must keep the join")
    assert(selfPairs(Crypto.encryptColumns(df, Seq("name"), key)) == 0,
      "GCM must not leak equality")
  }

  test("wrong key: tryDecrypt yields nulls, strict decrypt fails loudly") {
    val enc = Crypto.encryptColumns(df, Seq("name"), key)
    val wrong = "fedcba9876543210"
    val tried = Crypto.tryDecryptColumns(enc, Seq("name"), wrong)
    assert(tried.filter(col("name").isNull).count() == df.count())
    intercept[Exception] {
      Crypto.decryptColumns(enc, Seq("name"), wrong).collect()
    }
  }

  test("invalid key length rejected up front") {
    intercept[IllegalArgumentException] {
      Crypto.encryptColumns(df, Seq("name"), "short")
    }
  }
}
