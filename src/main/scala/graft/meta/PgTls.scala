package graft.meta

import java.io.{DataOutputStream, FileInputStream}
import java.net.Socket
import java.nio.file.{Files, Path, Paths}
import java.security.{KeyStore, SecureRandom}
import java.security.cert.{CertificateFactory, X509Certificate}

import javax.net.ssl.{KeyManagerFactory, SSLContext, SSLSocket, TrustManager, TrustManagerFactory, X509TrustManager}

/** TLS for the PostgreSQL wire protocol, both directions.
  *
  * The protocol is the public SSLRequest negotiation: before the
  * StartupMessage the client sends the 8-byte SSLRequest packet
  * (int32 length = 8, int32 code = 80877103); the server answers a
  * single byte — 'S' (proceed with a TLS handshake on the same
  * socket) or 'N' (no TLS here). The reference client gets this flow
  * for free from libpq and tests it via `sslmode` DSNs
  * (ref: test/sql/scanner/ssl.test:9-15); here it is implemented
  * directly over JSSE.
  *
  * `sslmode` semantics follow libpq:
  *  - `disable`: plaintext, no SSLRequest.
  *  - `allow` / `prefer`: opportunistic — `prefer` asks for TLS and
  *    falls back to plaintext on 'N'; `allow` starts plaintext and,
  *    when the SERVER refuses the attempt (hostssl-only pg_hba),
  *    retries the whole connection once over TLS — libpq's
  *    two-attempt flow, implemented in `PgWireTransport.fromDsn`.
  *  - `require`: TLS mandatory; certificate NOT verified unless a
  *    root cert is supplied (libpq's documented behavior — with
  *    `sslrootcert` present, `require` verifies like `verify-ca`).
  *  - `verify-ca`: TLS mandatory; server chain must verify against
  *    `sslrootcert`.
  *  - `verify-full`: `verify-ca` + host-name/IP endpoint verification
  *    (JSSE's HTTPS endpoint-identification algorithm, which checks
  *    the subject-alternative names exactly like libpq's host check).
  */
private[graft] object PgTls {

  /** SSLRequest magic: 1234.5679 in the protocol's (major<<16|minor)
    * encoding — distinct from any protocol version. */
  val SslRequestCode = 80877103

  def requiresTls(sslmode: String): Boolean = sslmode match {
    case "require" | "verify-ca" | "verify-full" => true
    case _ => false
  }

  def wantsTls(sslmode: String): Boolean =
    sslmode == "prefer" || requiresTls(sslmode)

  def validateMode(sslmode: String): Unit = sslmode match {
    case "disable" | "allow" | "prefer" | "require" | "verify-ca" | "verify-full" => ()
    case m => throw new IllegalArgumentException(
      s"unknown sslmode '$m' (disable|allow|prefer|require|verify-ca|verify-full)")
  }

  /** Client side: on a fresh plaintext socket, run the SSLRequest
    * negotiation for `sslmode` and return the socket to speak the v3
    * protocol on — the TLS-wrapped socket, or the same plaintext one
    * for the opportunistic modes. Closes the socket on failure. */
  def clientNegotiate(plain: Socket, host: String, port: Int, sslmode: String,
      sslrootcert: Option[String]): Socket = {
    if (!wantsTls(sslmode)) return plain
    try {
      val out = new DataOutputStream(plain.getOutputStream)
      out.writeInt(8)
      out.writeInt(SslRequestCode)
      out.flush()
      plain.getInputStream.read() match {
        case 'S' =>
          val ctx = clientContext(sslmode, sslrootcert)
          val ssl = ctx.getSocketFactory
            .createSocket(plain, host, port, true).asInstanceOf[SSLSocket]
          ssl.setUseClientMode(true)
          if (sslmode == "verify-full") {
            val p = ssl.getSSLParameters
            p.setEndpointIdentificationAlgorithm("HTTPS")
            ssl.setSSLParameters(p)
          }
          ssl.startHandshake() // surfaces chain/hostname failures here
          ssl
        case 'N' =>
          if (requiresTls(sslmode))
            throw new IllegalStateException(
              s"sslmode=$sslmode but server at $host:$port does not support SSL")
          plain // prefer: documented plaintext fallback
        case 'E' | -1 =>
          throw new IllegalStateException(
            s"server at $host:$port rejected the SSLRequest")
        case b =>
          throw new IllegalStateException(
            s"unexpected SSLRequest response byte $b from $host:$port")
      }
    } catch {
      case e: Throwable =>
        try plain.close() catch { case _: Throwable => }
        throw e
    }
  }

  /** Trust assembly per sslmode (see class doc): `require` without a
    * root cert encrypts without authenticating; any mode with a root
    * cert verifies the server chain against exactly that anchor set
    * (never the JVM default truststore — like libpq, which only ever
    * trusts `sslrootcert`). */
  private def clientContext(sslmode: String, sslrootcert: Option[String]): SSLContext = {
    val ctx = SSLContext.getInstance("TLS")
    val trust: Array[TrustManager] = sslrootcert match {
      case None =>
        // libpq verifies nothing below verify-ca: require/prefer/allow
        // without a root cert encrypt without authenticating
        if (sslmode == "verify-ca" || sslmode == "verify-full")
          throw new IllegalArgumentException(
            s"sslmode=$sslmode requires sslrootcert=<path to the CA certificate (PEM)>")
        else Array(acceptAnyServerCert)
      case Some(path) =>
        val cf = CertificateFactory.getInstance("X.509")
        val in = new FileInputStream(path)
        val certs =
          try {
            import scala.jdk.CollectionConverters._
            cf.generateCertificates(in).asScala.toSeq
          } finally in.close()
        require(certs.nonEmpty, s"no certificates found in sslrootcert=$path")
        val ks = KeyStore.getInstance(KeyStore.getDefaultType)
        ks.load(null, null)
        certs.zipWithIndex.foreach { case (c, i) => ks.setCertificateEntry(s"ca$i", c) }
        val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
        tmf.init(ks)
        tmf.getTrustManagers
    }
    ctx.init(null, trust, new SecureRandom())
    ctx
  }

  /** libpq `sslmode=require` without a root cert: encrypt, don't
    * authenticate. Scoped to that one documented mode — every other
    * TLS path verifies a caller-supplied anchor. */
  private def acceptAnyServerCert: X509TrustManager = new X509TrustManager {
    override def checkClientTrusted(chain: Array[X509Certificate], authType: String): Unit = ()
    override def checkServerTrusted(chain: Array[X509Certificate], authType: String): Unit = ()
    override def getAcceptedIssuers: Array[X509Certificate] = Array.empty
  }

  /** Server side: an SSLContext serving the identity in a PKCS12
    * keystore (the pg analogue of ssl_cert_file/ssl_key_file). */
  def serverContext(keystorePath: String, storePass: Array[Char]): SSLContext = {
    val ks = KeyStore.getInstance("PKCS12")
    val in = new FileInputStream(keystorePath)
    try ks.load(in, storePass) finally in.close()
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, storePass)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, new SecureRandom())
    ctx
  }

  /** Wrap an accepted socket after answering 'S' to an SSLRequest. */
  def serverWrap(ctx: SSLContext, raw: Socket): SSLSocket = {
    val ssl = ctx.getSocketFactory
      .createSocket(raw, null, raw.getPort, true).asInstanceOf[SSLSocket]
    ssl.setUseClientMode(false)
    ssl
  }
}

/** Self-signed TLS material for the loopback server, generated with
  * the JDK's own `keytool` (no extra dependencies) — the test-double
  * counterpart of a server's ssl_cert_file, exactly like [[InMemoryPg]]
  * is the test double of the server itself. One key pair + exported
  * root PEM per `generate()` call; [[material]] is the shared per-JVM
  * instance, and tests mint a second, unrelated CA to prove that
  * verify-ca rejects a chain anchored elsewhere.
  */
private[graft] object PgTlsTestMaterial {
  final case class Material(keystorePath: String, rootCertPath: String)

  val StorePass = "graft-tls-loopback"

  /** Shared per-JVM server identity (CN/SAN = 127.0.0.1, localhost). */
  lazy val material: Material = generate()

  def generate(): Material = {
    val dir = Files.createTempDirectory("graft_tls_")
    dir.toFile.deleteOnExit()
    val ks = dir.resolve("ks.p12")
    val pem = dir.resolve("root.pem")
    val keytool = Paths.get(System.getProperty("java.home"), "bin", "keytool")
    run(keytool.toString, "-genkeypair", "-alias", "graft", "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "3650", "-dname", "CN=127.0.0.1",
      "-ext", "SAN=IP:127.0.0.1,DNS:localhost",
      "-keystore", ks.toString, "-storetype", "PKCS12", "-storepass", StorePass)
    run(keytool.toString, "-exportcert", "-rfc", "-alias", "graft",
      "-keystore", ks.toString, "-storepass", StorePass, "-file", pem.toString)
    Seq(ks, pem).foreach(_.toFile.deleteOnExit())
    Material(ks.toString, pem.toString)
  }

  private def run(cmd: String*): Unit = {
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val outBytes = p.getInputStream.readAllBytes()
    val code = p.waitFor()
    if (code != 0)
      throw new IllegalStateException(
        s"keytool failed ($code): ${new String(outBytes, java.nio.charset.StandardCharsets.UTF_8)}")
  }
}
