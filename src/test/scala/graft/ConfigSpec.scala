package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.ConfigBootstrap
import graft.pipeline.ConfigBootstrap._

/** S4 config bootstrap: layering precedence, env-key mapping, masked
  * secret decryption (reference `main.rs:65-80`, `encryption.rs`). */
class ConfigSpec extends AnyFunSuite {

  private val master = Array.tabulate[Byte](32)(_.toByte)
  private val iv = Array.tabulate[Byte](12)(i => (i * 7).toByte)
  private val kms = new LocalKms(master)

  test("layering: defaults < file < env, env keys map dotted names") {
    val s = ConfigBootstrap.load(
      defaults = Map("db.url" -> "jdbc:none", "batch.size" -> "10000"),
      file = Map("db.url" -> "jdbc:postgresql://replica:5432/hs"),
      env = Map("GRAFT_BATCH_SIZE" -> "5000"),
      secretKeys = Set.empty, kms = kms)
    assert(s("db.url") == "jdbc:postgresql://replica:5432/hs") // file beats default
    assert(s("batch.size") == "5000")                          // env beats both
    assert(envKey("kafka.brokers") == "GRAFT_KAFKA_BROKERS")
  }

  test("secrets decrypt through the KMS and never print in plain form") {
    val cipher = ConfigBootstrap.encrypt(master, iv, "s3cret-master-key")
    val s = ConfigBootstrap.load(
      defaults = Map.empty,
      file = Map("db.password" -> cipher, "db.user" -> "app"),
      env = Map.empty,
      secretKeys = Set("db.password"), kms = kms)
    assert(s.secret("db.password").reveal() == "s3cret-master-key")
    // masked everywhere printable
    assert(!s.toString.contains("s3cret"))
    assert(!s.secret("db.password").toString.contains("s3cret"))
    // and the plain-values map never holds the secret at all
    assert(!s.values.contains("db.password"))
  }

  test("encrypt/decrypt round-trips and tampered ciphertext fails loudly") {
    val cipher = ConfigBootstrap.encrypt(master, iv, "payload")
    assert(kms.decrypt(cipher) == "payload")
    val bytes = java.util.Base64.getDecoder.decode(cipher)
    bytes(bytes.length - 1) = (bytes(bytes.length - 1) ^ 1).toByte
    val tampered = java.util.Base64.getEncoder.encodeToString(bytes)
    intercept[Exception] { kms.decrypt(tampered) } // GCM tag mismatch
  }

  test("env can override a secret with a differently-encrypted value") {
    val fileCipher = ConfigBootstrap.encrypt(master, iv, "old")
    val envCipher = ConfigBootstrap.encrypt(master,
      Array.tabulate[Byte](12)(i => (i + 1).toByte), "new")
    val s = ConfigBootstrap.load(
      defaults = Map.empty,
      file = Map("api.key" -> fileCipher),
      env = Map("GRAFT_API_KEY" -> envCipher),
      secretKeys = Set("api.key"), kms = kms)
    assert(s.secret("api.key").reveal() == "new")
  }
}
