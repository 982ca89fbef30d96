package graft.meta

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

/** SCRAM-SHA-256 primitives (RFC 5802 / RFC 7677) shared by the socket
  * client ([[PgWireTransport]]) and the loopback server
  * ([[PgWireServer]]). PostgreSQL negotiates the mechanism through the
  * v3 protocol's AuthenticationSASL / SASLResponse exchange; the
  * reference client gets all of this for free from libpq
  * (ref: src/postgres_connection.cpp DSN handling + test/sql/scanner/
  * ssl.test exercising auth'd connections).
  *
  * Passwords are used as UTF-8 bytes without SASLprep normalization —
  * matching libpq's behavior for passwords that are already valid
  * UTF-8 without prohibited code points (the overwhelmingly common
  * case; PostgreSQL itself only applies SASLprep opportunistically).
  */
private[graft] object PgScram {

  val Mechanism = "SCRAM-SHA-256"
  /** PostgreSQL's default iteration count for scram-sha-256 verifiers. */
  val DefaultIterations = 4096

  def b64(b: Array[Byte]): String = Base64.getEncoder.encodeToString(b)
  def unb64(s: String): Array[Byte] = Base64.getDecoder.decode(s)

  def hmac(key: Array[Byte], msg: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(msg)
  }
  def hmac(key: Array[Byte], msg: String): Array[Byte] = hmac(key, msg.getBytes(UTF_8))

  def sha256(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(b)

  /** Hi(password, salt, i) = PBKDF2-HMAC-SHA-256 with a 256-bit key. */
  def saltedPassword(password: String, salt: Array[Byte], iterations: Int): Array[Byte] = {
    val spec = new PBEKeySpec(password.toCharArray, salt, iterations, 256)
    javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }

  def clientKey(salted: Array[Byte]): Array[Byte] = hmac(salted, "Client Key")
  def serverKey(salted: Array[Byte]): Array[Byte] = hmac(salted, "Server Key")
  def storedKey(salted: Array[Byte]): Array[Byte] = sha256(clientKey(salted))

  def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    a.zip(b).map { case (x, y) => (x ^ y).toByte }

  /** parse `k=v,k=v,...` SCRAM attribute lists (values may contain '='
    * after the first, e.g. base64 padding) */
  def attrs(msg: String): Map[Char, String] =
    msg.split(",").toSeq.collect {
      case kv if kv.length >= 2 && kv(1) == '=' => kv(0) -> kv.substring(2)
    }.toMap

  final case class ServerFirst(nonce: String, salt: Array[Byte], iterations: Int)

  def parseServerFirst(msg: String): ServerFirst = {
    val a = attrs(msg)
    ServerFirst(
      a.getOrElse('r', throw new IllegalStateException(s"SCRAM server-first missing r=: $msg")),
      unb64(a.getOrElse('s', throw new IllegalStateException(s"SCRAM server-first missing s=: $msg"))),
      a.getOrElse('i', throw new IllegalStateException(s"SCRAM server-first missing i=: $msg")).toInt)
  }

  /** printable nonce (RFC 5802: printable ASCII except ','), from a
    * caller-supplied RNG so tests can pin it */
  def nonce(rng: java.security.SecureRandom, len: Int = 18): String = {
    val alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
    val sb = new StringBuilder
    (0 until len).foreach(_ => sb += alphabet(rng.nextInt(alphabet.length)))
    sb.toString
  }

  /** AuthMessage := client-first-bare + "," + server-first + "," +
    * client-final-without-proof */
  def authMessage(clientFirstBare: String, serverFirst: String, clientFinalNoProof: String): String =
    s"$clientFirstBare,$serverFirst,$clientFinalNoProof"

  def clientProof(salted: Array[Byte], authMsg: String): Array[Byte] = {
    val ck = clientKey(salted)
    xor(ck, hmac(sha256(ck), authMsg))
  }

  def serverSignature(salted: Array[Byte], authMsg: String): Array[Byte] =
    hmac(serverKey(salted), authMsg)

  /** server-side proof check from the stored verifier: recover
    * ClientKey = proof XOR HMAC(StoredKey, auth) and compare
    * H(ClientKey) against StoredKey (RFC 5802 §3) */
  def verifyClientProof(stored: Array[Byte], authMsg: String, proof: Array[Byte]): Boolean = {
    val recovered = xor(proof, hmac(stored, authMsg))
    MessageDigest.isEqual(sha256(recovered), stored)
  }
}

/** The legacy md5 challenge/response, shared by client and server so
  * the order-sensitive construction (`"md5" + md5(md5(password+user)
  * + salt)`) cannot silently diverge between the two sides. */
private[graft] object PgMd5 {
  def response(user: String, password: String, salt: Array[Byte]): String = {
    val md = MessageDigest.getInstance("MD5")
    def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
    val inner = hex(md.digest((password + user).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    md.reset()
    md.update(inner.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    md.update(salt)
    "md5" + hex(md.digest())
  }
}
