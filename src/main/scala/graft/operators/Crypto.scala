package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level encryption — the engine analog of the reference's
  * at-rest encryption (KMS/SSE declared throughout its terraform, e.g.
  * modules/s3/main.tf). An object store encrypts blindly underneath; a
  * query engine's version of the same control is encrypting the
  * sensitive COLUMNS, so parquet at rest never holds cleartext PII
  * while every other column stays queryable. Built on Spark's
  * codegen'd `aes_encrypt`/`aes_decrypt` — no UDF in the scan path.
  *
  * Two modes, deliberately:
  *  - GCM (default, random IV per row): semantically secure — equal
  *    values encrypt differently. For columns that are decrypted on
  *    read and never joined or grouped on.
  *  - deterministic (ECB): equal values share ciphertext, so equality
  *    joins / groupBy / exact-dedup still work ON the encrypted column
  *    — the classic determinism-for-joinability tradeoff. Weaker
  *    secrecy (equality leaks); use only where joinability is the
  *    point (pseudonymous keys).
  *
  * Keys are 16/24/32-byte strings injected by the caller — the KMS
  * seam: at 100 TB the key comes from a key service, and rotation is
  * `decryptColumns(old) |> encryptColumns(new)` over the affected
  * partitions only. Keys are never persisted by this module.
  *
  * Round-trip, wrong-key, and determinism semantics are spec-pinned
  * (CryptoSpec); the corpus-wide round-trip invariant is oracle-checked
  * (f15_crypto_roundtrip).
  */
object Crypto {

  private def mode(deterministic: Boolean) = if (deterministic) "ECB" else "GCM"

  /** Replace each column in `cols` with its base64'd AES ciphertext. */
  def encryptColumns(df: DataFrame, cols: Seq[String], key: String,
      deterministic: Boolean = false): DataFrame = {
    require(Set(16, 24, 32).contains(key.getBytes("UTF-8").length),
      "AES key must be 16/24/32 bytes")
    cols.foldLeft(df)((d, c) => d.withColumn(c,
      base64(aes_encrypt(col(c).cast("binary"), lit(key), lit(mode(deterministic))))))
  }

  /** Inverse of [[encryptColumns]]: base64'd ciphertext back to the
    * cleartext string column. A wrong key fails loudly (GCM tag check)
    * rather than yielding garbage; use [[tryDecryptColumns]] to map
    * undecryptable values to null instead.
    */
  def decryptColumns(df: DataFrame, cols: Seq[String], key: String,
      deterministic: Boolean = false): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c,
      aes_decrypt(unbase64(col(c)), lit(key), lit(mode(deterministic)))
        .cast("string")))

  /** Null-on-failure decryption (wrong key, corrupt ciphertext). */
  def tryDecryptColumns(df: DataFrame, cols: Seq[String], key: String,
      deterministic: Boolean = false): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c,
      try_aes_decrypt(unbase64(col(c)), lit(key), lit(mode(deterministic)))
        .cast("string")))
}
