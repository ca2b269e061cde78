package graft.io

import java.util.Base64

import javax.crypto.{Cipher, SecretKeyFactory}
import javax.crypto.spec.{IvParameterSpec, PBEKeySpec, SecretKeySpec}

/** Config-secret encryption/decryption (SURVEY.md §2.13, row D8).
  *
  * Matches the reference's scheme (reference src/main/utility/
  * encrypt_decrypt.py:20-39): a 64-byte PBKDF2-HMAC-SHA1 derivation
  * (1000 rounds) of the passphrase over a UTF-8 salt, truncated to 32
  * bytes for AES-256-CBC with a literal UTF-8 IV, PKCS7 padding,
  * base64-encoded ciphertext. The reference reads key/iv/salt from its
  * config module and swallows failures with sys.exit; here they are
  * explicit parameters and errors propagate (same deliberate deviation as
  * the K3 JDBC sink — a silent exit in library code hides misconfig).
  *
  * Pure driver-side functions — secrets never enter a DataFrame, so they
  * cannot leak into shuffle files, event logs, or the UI. Java ships both
  * primitives (`PBKDF2WithHmacSHA1`, `AES/CBC/PKCS5Padding` — PKCS5 and
  * PKCS7 coincide for AES's 16-byte blocks), so the operator is
  * dependency-free. Interop verified against a PBKDF2-HMAC-SHA1 +
  * AES-256-CBC vector computed with an independent implementation
  * (CredentialsSpec).
  */
object Credentials {

  private val Rounds = 1000
  private val DerivedLen = 64 // reference derives 64 bytes, uses the first 32
  private val KeyLen = 32

  /** PBKDF2-HMAC-SHA1(passphrase, salt, 1000 rounds, 64 bytes)[0, 32) —
    * the reference's `get_private_key` (encrypt_decrypt.py:24-28).
    */
  def deriveKey(passphrase: String, salt: String): Array[Byte] = {
    val spec = new PBEKeySpec(
      passphrase.toCharArray, salt.getBytes("UTF-8"), Rounds, DerivedLen * 8)
    val kdf = SecretKeyFactory.getInstance("PBKDF2WithHmacSHA1")
    kdf.generateSecret(spec).getEncoded.take(KeyLen)
  }

  private def cipher(mode: Int, passphrase: String, salt: String, iv: String): Cipher = {
    require(iv.getBytes("UTF-8").length == 16,
      "iv must be exactly 16 UTF-8 bytes (AES block size)")
    val c = Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(mode, new SecretKeySpec(deriveKey(passphrase, salt), "AES"),
      new IvParameterSpec(iv.getBytes("UTF-8")))
    c
  }

  /** Encrypt a UTF-8 string to base64 (reference `encrypt`,
    * encrypt_decrypt.py:31-34).
    */
  def encrypt(raw: String, passphrase: String, salt: String, iv: String): String =
    Base64.getEncoder.encodeToString(
      cipher(Cipher.ENCRYPT_MODE, passphrase, salt, iv).doFinal(raw.getBytes("UTF-8")))

  /** Decrypt a base64 ciphertext back to the UTF-8 string (reference
    * `decrypt`, encrypt_decrypt.py:37-39). Throws on a wrong key/iv/salt
    * (bad padding) instead of returning garbage.
    */
  def decrypt(enc: String, passphrase: String, salt: String, iv: String): String =
    new String(
      cipher(Cipher.DECRYPT_MODE, passphrase, salt, iv).doFinal(Base64.getDecoder.decode(enc)),
      "UTF-8")
}
