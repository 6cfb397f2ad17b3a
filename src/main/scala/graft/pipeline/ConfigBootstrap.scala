package graft.pipeline

/** S4 — config-time bootstrap (reference `main.rs:65-80` →
  * `encryption.rs:11-186`): layered settings with secret fields
  * decrypted once at startup, before anything else runs.
  *
  * Shape mirrored from the reference:
  *  - layered sources: defaults < config-file entries < environment
  *    overrides (the reference's TOML + env layering);
  *  - secret config values never exist in plain form in the settings
  *    object's printable surface — they are carried as [[Secret]]
  *    (masked `toString`, value reachable only via `reveal()`);
  *  - decryption goes through a pluggable [[Kms]] seam. The local
  *    master-key variant (AES-GCM, the same convention as the data
  *    path's merchant key store in `operators/Crypto`) is implemented;
  *    the remote key-manager variant stays config-gated off, exactly as
  *    in the reference (`main.rs:155-166`).
  *
  * Driver-side, runs once, out of the data path by design (SURVEY §2.1
  * S4) — nothing here touches a DataFrame.
  */
object ConfigBootstrap {

  /** A secret value: masked in toString/logs; the plaintext is only
    * reachable through `reveal()`. */
  final class Secret(private val v: String) {
    def reveal(): String = v
    override def toString: String = "Secret(****)"
    override def equals(o: Any): Boolean = o match {
      case s: Secret => s.v == v
      case _ => false
    }
    override def hashCode: Int = v.hashCode
  }

  /** Secret-decryption seam (`encryption.rs`'s secrets-manager client). */
  trait Kms {
    def decrypt(cipherB64: String): String
  }

  /** Local master-key KMS: AES-256-GCM, payload = base64(12-byte IV ∥
    * ciphertext ∥ tag). */
  final class LocalKms(masterKey: Array[Byte]) extends Kms {
    require(masterKey.length == 32, "master key must be 32 bytes (AES-256)")
    def decrypt(cipherB64: String): String = {
      val all = java.util.Base64.getDecoder.decode(cipherB64)
      val c = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
      c.init(javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(masterKey, "AES"),
        new javax.crypto.spec.GCMParameterSpec(128, all, 0, 12))
      new String(c.doFinal(all, 12, all.length - 12), "UTF-8")
    }
  }

  /** Fixture-side encrypt twin of [[LocalKms.decrypt]]. */
  def encrypt(masterKey: Array[Byte], iv: Array[Byte], plain: String): String = {
    require(iv.length == 12, "GCM IV must be 12 bytes")
    val c = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(masterKey, "AES"),
      new javax.crypto.spec.GCMParameterSpec(128, iv))
    java.util.Base64.getEncoder.encodeToString(iv ++ c.doFinal(plain.getBytes("UTF-8")))
  }

  /** Bootstrapped settings: plain values + decrypted-but-masked secrets. */
  final case class Settings(
      values: Map[String, String],
      secrets: Map[String, Secret]) {
    def apply(key: String): String = values(key)
    def secret(key: String): Secret = secrets(key)
    // the whole settings object must be safe to log
    override def toString: String =
      s"Settings(${values.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(", ")}, " +
        s"secrets=[${secrets.keys.toSeq.sorted.mkString(", ")}])"
  }

  /** Env-var form of a settings key: `kafka.brokers` → `GRAFT_KAFKA_BROKERS`. */
  def envKey(key: String): String =
    "GRAFT_" + key.toUpperCase.replace('.', '_')

  /** Layered load: `defaults` < `file` < `env` (highest wins), then
    * every key in `secretKeys` is decrypted through the KMS and moved
    * into the masked secret map — it never appears in `values`. */
  def load(
      defaults: Map[String, String],
      file: Map[String, String],
      env: Map[String, String],
      secretKeys: Set[String],
      kms: Kms): Settings = {
    val layered = defaults ++ file ++
      (defaults.keySet ++ file.keySet ++ secretKeys)
        .flatMap(k => env.get(envKey(k)).map(k -> _)).toMap
    val (secretEntries, plain) = layered.partition { case (k, _) => secretKeys(k) }
    Settings(plain, secretEntries.map { case (k, v) => k -> new Secret(kms.decrypt(v)) })
  }
}
