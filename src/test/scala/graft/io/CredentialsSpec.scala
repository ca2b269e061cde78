package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** D8 credential decrypt (reference src/main/utility/encrypt_decrypt.py) —
  * pure functions, no SparkSession needed.
  */
class CredentialsSpec extends AnyFunSuite {

  private val key = "test_password"
  private val iv = "0123456789abcdef"
  private val salt = "pinch_of_salt"

  test("known-answer interop: matches an independent PBKDF2+AES-CBC implementation") {
    // Vector computed with python `cryptography` + hashlib.pbkdf2_hmac over
    // the reference's exact scheme (PBKDF2-HMAC-SHA1 x1000, 64-byte derive,
    // first 32 bytes, AES-256-CBC, PKCS7, base64).
    assert(Credentials.deriveKey(key, salt).map("%02x".format(_)).mkString ===
      "4eaedb598ae2c90625218cb60955aa865bf4032040afd65d8f83909c0bfeb887")
    val plain = "db_user:db_pass@host:3306/sales"
    val expected = "HpnghMkvddQUA7lzRY7IFbhXC4hQsnJ8zHQV6itmlmU="
    assert(Credentials.encrypt(plain, key, salt, iv) === expected)
    assert(Credentials.decrypt(expected, key, salt, iv) === plain)
  }

  test("round trip over block-boundary lengths and unicode") {
    // 15/16/17 bytes cross the PKCS7 padding boundary (full pad block at 16)
    for (s <- Seq("", "a", "exactly16bytes!!", "seventeen bytes!!",
        "ünïcødé sécret ✓", "x" * 1000)) {
      assert(Credentials.decrypt(Credentials.encrypt(s, key, salt, iv), key, salt, iv) === s)
    }
  }

  test("wrong passphrase fails loudly, not with garbage") {
    val enc = Credentials.encrypt("secret", key, salt, iv)
    intercept[Exception](Credentials.decrypt(enc, "wrong_password", salt, iv))
  }

  test("iv must be 16 bytes") {
    intercept[IllegalArgumentException](Credentials.encrypt("x", key, salt, "short_iv"))
  }
}
