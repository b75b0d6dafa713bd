package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import javax.net.ssl.{HttpsURLConnection, KeyManagerFactory, SSLContext, TrustManagerFactory}

/** mTLS on the spec-push control socket — the reference's PKI daemon
  * identity (`pki/src/lib.rs:1-266`; daemons join the control plane over
  * wss with client certs, `control_plane/src/http/daemon_api/mod.rs:146-148`)
  * re-expressed as standard JSSE: the server presents its cert, REQUIRES a
  * client cert chained to its truststore, and a client without one fails
  * the handshake — it never reaches the HTTP layer, token or not.
  *
  * Key material is generated per-run with the JDK's own `keytool` (no new
  * dependencies): two self-signed identities that trust each other.
  */
class MtlsSpec extends AnyFunSuite {

  private val keytoolBin =
    java.nio.file.Paths.get(sys.props("java.home"), "bin", "keytool").toString
  private val pass = "changeit1"

  private def keytool(args: String*): Unit = {
    val pb = new ProcessBuilder((keytoolBin +: args): _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    assert(p.waitFor() == 0, s"keytool ${args.headOption.getOrElse("")} failed:\n$out")
  }

  /** (keystore, truststore) PKCS#12 pair: own self-signed identity plus
    * trust in `peerCert`. */
  private def identity(dir: Path, name: String, san: String): (Path, Path) = {
    val ks = dir.resolve(s"$name.p12")
    keytool("-genkeypair", "-alias", name, "-keyalg", "RSA", "-keysize", "2048",
      "-validity", "1", "-dname", s"CN=$name", "-ext", s"san=$san",
      "-storetype", "PKCS12", "-keystore", ks.toString, "-storepass", pass)
    val cert = dir.resolve(s"$name.cer")
    keytool("-exportcert", "-alias", name, "-keystore", ks.toString,
      "-storepass", pass, "-file", cert.toString)
    (ks, cert)
  }

  private def truststore(dir: Path, name: String, cert: Path): Path = {
    val ts = dir.resolve(s"$name.p12")
    keytool("-importcert", "-alias", "peer", "-file", cert.toString,
      "-storetype", "PKCS12", "-keystore", ts.toString, "-storepass", pass,
      "-noprompt")
    ts
  }

  private def clientContext(keystore: Option[Path], trust: Path): SSLContext = {
    val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    val tks = java.security.KeyStore.getInstance("PKCS12")
    val tin = Files.newInputStream(trust)
    try tks.load(tin, pass.toCharArray) finally tin.close()
    tmf.init(tks)
    val kms = keystore.map { p =>
      val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
      val ks = java.security.KeyStore.getInstance("PKCS12")
      val in = Files.newInputStream(p)
      try ks.load(in, pass.toCharArray) finally in.close()
      kmf.init(ks, pass.toCharArray)
      kmf.getKeyManagers
    }.orNull
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kms, tmf.getTrustManagers, null)
    ctx
  }

  private def httpsPut(ctx: SSLContext, url: String, body: String,
                       bearer: Option[String]): (Int, String) = {
    val c = new java.net.URL(url).openConnection()
      .asInstanceOf[HttpsURLConnection]
    c.setSSLSocketFactory(ctx.getSocketFactory)
    c.setRequestMethod("PUT")
    // the JDK keep-alive cache is keyed by host:port, NOT by socket
    // factory — without this, the no-cert client would silently reuse the
    // authenticated client's pooled TLS connection and "pass"
    c.setRequestProperty("Connection", "close")
    bearer.foreach(t => c.setRequestProperty("Authorization", s"Bearer $t"))
    c.setDoOutput(true)
    val os = c.getOutputStream
    try os.write(body.getBytes("UTF-8")) finally os.close()
    val code = c.getResponseCode
    val is = if (code < 400) c.getInputStream else c.getErrorStream
    val text = if (is == null) "" else new String(is.readAllBytes(), "UTF-8")
    (code, text)
  }

  test("client with trusted cert pushes; client without cert fails the handshake") {
    val pki = Files.createTempDirectory("graft_pki")
    val specDir = Files.createTempDirectory("graft_mtls_specs")
    // server cert must carry the IP SAN or the CLIENT's hostname
    // verification (left ON — this is the point of TLS) rejects it
    val (serverKs, serverCert) = identity(pki, "server", "ip:127.0.0.1")
    val (clientKs, clientCert) = identity(pki, "pusher", "dns:pusher")
    val serverTrust = truststore(pki, "server_trust", clientCert)
    val clientTrust = truststore(pki, "client_trust", serverCert)

    val server = new SpecPushServer(specDir, port = 0,
      token = Some("sekrit"),
      tls = Some(TlsConfig(serverKs, pass.toCharArray,
        serverTrust, pass.toCharArray)))
    server.start()
    try {
      val url = s"https://127.0.0.1:${server.boundPort}/specs/m"
      // parse/IO-validated only — no orchestrator polls this dir, so the
      // paths are never opened
      val spec = """{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"/tmp/none.parquet"}},
        {"id":"sink","name":"parquet_destination","config":{"path":"/tmp/none_out"}}],
        "edges":[["src","sink"]]}"""

      // full mTLS + bearer → accepted, file lands atomically in the dir
      val (code, _) = httpsPut(clientContext(Some(clientKs), clientTrust),
        url, spec, bearer = Some("sekrit"))
      assert(code == 200)
      assert(Files.exists(specDir.resolve("m.json")))

      // right cert, wrong token → TLS fine, HTTP layer still refuses
      val (code2, _) = httpsPut(clientContext(Some(clientKs), clientTrust),
        url, spec, bearer = Some("wrong"))
      assert(code2 == 401)

      // no client cert → handshake failure, never reaches HTTP
      val bare = clientContext(None, clientTrust)
      val ex = intercept[java.io.IOException] {
        httpsPut(bare, url, spec, bearer = Some("sekrit"))
      }
      assert(ex.isInstanceOf[javax.net.ssl.SSLException] ||
        ex.getMessage != null, s"expected TLS failure, got $ex")

      // untrusted client cert (self-signed, not in the server's
      // truststore) → handshake failure too
      val (rogueKs, _) = identity(pki, "rogue", "dns:rogue")
      intercept[java.io.IOException] {
        httpsPut(clientContext(Some(rogueKs), clientTrust),
          url, spec, bearer = Some("sekrit"))
      }
    } finally server.stop()
  }
}
