package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** T1 — two-level field decryption (reference `payment_intent.rs:94-101`,
  * `src/main.rs:192-216`): each merchant's data key is stored encrypted
  * under a master key in `merchant_key_store`; PII fields are encrypted
  * under the merchant key.
  *
  * Spark-first: both levels are the built-in `aes_decrypt` expression
  * (codegen'd, executor-side) — decrypt the key column of the broadcast
  * key store once per merchant row, then decrypt entity fields with the
  * joined key. No UDF, no driver-side crypto. The remote key-manager
  * variant (`main.rs:155-166`) is config-gated in the reference and out of
  * v1 scope (SURVEY.md §7).
  *
  * The harness has no encrypted fixtures, so the query builds them in-plan
  * (encrypt → join → decrypt) and the oracle checks the round-trip equals
  * the plaintext; CryptoSpec pins fixed-vector AES-GCM/CBC behavior.
  */
object Crypto {
  private val MasterKey = "0123456789abcdef0123456789abcdef" // 32B = AES-256

  /** Deterministic 32-byte per-merchant key (hex text, used as raw bytes —
    * same convention as a random key, but reproducible in tests). */
  private def merchantKey(id: Column): Column =
    substring(sha2(concat(lit("mk:"), id.cast("string")), 256), 1, 32)

  /** Two-level round trip over the star schema: customer ~ key store,
    * orders ~ entity with an encrypted PII field. */
  def decryptTwoLevel(spark: SparkSession, dir: String): DataFrame = {
    val keyStore = Tables.load(spark, dir, "customer").select(
      col("c_custkey").as("merchant_id"),
      // level 1: merchant key encrypted under the master key
      aes_encrypt(merchantKey(col("c_custkey")).cast("binary"),
        lit(MasterKey).cast("binary"), lit("GCM")).as("enc_key"))

    val entity = Tables.load(spark, dir, "orders").select(
      col("o_orderkey"), col("o_custkey").as("merchant_id"),
      // level 2: PII field encrypted under the merchant key
      aes_encrypt(col("o_orderpriority").cast("binary"),
        merchantKey(col("o_custkey")).cast("binary"), lit("GCM"))
        .as("enc_priority"))

    entity.join(broadcast(keyStore), Seq("merchant_id"))
      .select(col("o_orderkey"), col("merchant_id"),
        aes_decrypt(col("enc_priority"),
          aes_decrypt(col("enc_key"), lit(MasterKey).cast("binary"),
            lit("GCM")),
          lit("GCM")).cast("string").as("priority"))
      .orderBy("o_orderkey")
  }

  /** Crypto-shredding semantics: when a merchant's key-store row is
    * GONE (GDPR erasure = delete the key, the ciphertext stays), its
    * rows must surface as unreadable-but-accounted, not vanish and not
    * fail the job. Left join against the shredded key store;
    * `try_aes_decrypt` yields NULL for the missing keys (ANSI mode
    * would otherwise abort the whole run on the first bad decrypt);
    * every row carries a readable/shredded status. */
  def decryptShredded(spark: SparkSession, dir: String): DataFrame = {
    // merchants 0,5,10,… have been erased from the key store
    val keyStore = Tables.load(spark, dir, "customer")
      .filter(col("c_custkey") % 5 =!= 0)
      .select(
        col("c_custkey").as("merchant_id"),
        aes_encrypt(merchantKey(col("c_custkey")).cast("binary"),
          lit(MasterKey).cast("binary"), lit("GCM")).as("enc_key"))

    val entity = Tables.load(spark, dir, "orders").select(
      col("o_orderkey"), col("o_custkey").as("merchant_id"),
      aes_encrypt(col("o_orderpriority").cast("binary"),
        merchantKey(col("o_custkey")).cast("binary"), lit("GCM"))
        .as("enc_priority"))

    entity.join(broadcast(keyStore), Seq("merchant_id"), "left")
      .select(col("o_orderkey"), col("merchant_id"),
        expr("""try_aes_decrypt(enc_priority,
                  try_aes_decrypt(enc_key, binary('0123456789abcdef0123456789abcdef'), 'GCM'),
                  'GCM')""").cast("string").as("priority"),
        when(col("enc_key").isNull, lit("shredded")).otherwise(lit("ok"))
          .as("key_status"))
      .orderBy("o_orderkey")
  }
}
