package graft.plans

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.nio.charset.StandardCharsets.UTF_8

/** The websocket push channel: a daemon that holds a connection receives
  * `RefetchGraph` the moment a spec mutation lands and reconciles
  * WITHOUT waiting for its poll interval — the reference's daemon_api
  * wss push (`control_plane/src/http/daemon_api/mod.rs:146-148`)
  * re-expressed over the sibling RFC 6455 listener. */
class SpecPushWsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Minimal RFC 6455 client: handshake, then read ONE text frame.
    * `sockOf` lets the TLS test hand in an SSLSocket. */
  private final class WsClient(port: Int, auth: Option[String] = scala.None,
      sockOf: Int => java.net.Socket = new java.net.Socket("127.0.0.1", _)) {
    private val sock = sockOf(port)
    private val in = sock.getInputStream
    private val out = sock.getOutputStream
    val handshakeStatus: Int = {
      val key = java.util.Base64.getEncoder.encodeToString(
        Array.fill(16)(scala.util.Random.nextInt(256).toByte))
      val hdr = new StringBuilder
      hdr.append("GET /ws HTTP/1.1\r\nHost: 127.0.0.1\r\n")
      hdr.append("Upgrade: websocket\r\nConnection: Upgrade\r\n")
      hdr.append(s"Sec-WebSocket-Key: $key\r\nSec-WebSocket-Version: 13\r\n")
      auth.foreach(t => hdr.append(s"Authorization: Bearer $t\r\n"))
      hdr.append("\r\n")
      out.write(hdr.toString.getBytes(UTF_8)); out.flush()
      // read the status line + headers up to the blank line
      val head = new StringBuilder
      var prev = 0; var b = in.read()
      while (b != -1 && !(prev == '\n' && (b == '\r' || b == '\n'))) {
        head.append(b.toChar); if (b != '\r') prev = b; b = in.read()
      }
      if (b == '\r') in.read()
      head.toString.split(" ")(1).toInt
    }
    /** Block until one TEXT frame arrives; returns its payload. */
    def readText(timeoutMs: Int = 10000): String = {
      sock.setSoTimeout(timeoutMs)
      val h0 = in.read(); val h1 = in.read()
      assert(h0 == 0x81, s"expected FIN+text frame, got $h0")
      val len = h1 & 0x7f
      assert((h1 & 0x80) == 0, "server frames must be unmasked")
      val buf = new Array[Byte](len)
      var off = 0
      while (off < len) off += in.read(buf, off, len - off)
      new String(buf, UTF_8)
    }
    def sendPing(payload: Array[Byte]): Unit = {
      val mask = Array[Byte](1, 2, 3, 4)
      out.write(0x89); out.write(0x80 | payload.length)
      out.write(mask)
      out.write(payload.zipWithIndex.map { case (p, i) =>
        (p ^ mask(i % 4)).toByte })
      out.flush()
    }
    def readPong(): Array[Byte] = {
      val h0 = in.read(); val h1 = in.read()
      assert(h0 == 0x8a, s"expected pong, got $h0")
      val buf = new Array[Byte](h1 & 0x7f)
      var off = 0
      while (off < buf.length) off += in.read(buf, off, buf.length - off)
      buf
    }
    def close(): Unit = sock.close()
  }

  private def specJson(tmp: String, tag: String) =
    s"""{"sections":[
      {"id":"src","name":"parquet_source","config":{"path":"${TestSpark.sf}/region.parquet"}},
      {"id":"tag","name":"tagging","config":{"column":"tag","text":"$tag"}},
      {"id":"sink","name":"parquet_destination","config":{"path":"$tmp/out_$tag","truncate":"true"}}],
      "edges":[["src","tag"],["tag","sink"]]}"""

  private def httpPost(url: String, body: String): Int = {
    val c = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    c.setRequestMethod("POST"); c.setDoOutput(true)
    val os = c.getOutputStream
    try os.write(body.getBytes(UTF_8)) finally os.close()
    c.getResponseCode
  }

  test("graph delivery refuses cleartext on a non-loopback bind") {
    // graphProvider responses carry real secrets; a bearer token does
    // not encrypt — a non-loopback bind with no TLS must fail to
    // CONSTRUCT (a misconfigured fleet fails to start, never leaks)
    val provider = Some(() => "{}")
    val ex = intercept[IllegalArgumentException] {
      new SpecPushWs(host = "0.0.0.0", graphProvider = provider)
    }
    assert(ex.getMessage.contains("requires"), ex.getMessage)
    // loopback stays fine; the explicit opt-out stays available; and a
    // non-loopback bind WITHOUT a provider is notification-only (no
    // secrets ride the channel) so it constructs as before
    val ok1 = new SpecPushWs(host = "127.0.0.1", graphProvider = provider)
    ok1.stop()
    val ok2 = new SpecPushWs(host = "0.0.0.0", graphProvider = provider,
      allowInsecureGraphDelivery = true)
    ok2.stop()
    val ok3 = new SpecPushWs(host = "0.0.0.0")
    ok3.stop()
  }

  test("push lands -> RefetchGraph arrives -> reconcile WITHOUT polling") {
    val tmp = Files.createTempDirectory("graft_ws").toString
    val specDir = Files.createTempDirectory("graft_ws_specs")
    val orch = new Orchestrator(spark, restartBackoffMs = 10)
    val watcher = new SpecDirWatcher(orch, specDir)
    val ws = new SpecPushWs()
    ws.start()
    val server = new SpecPushServer(specDir, port = 0,
      onChange = Some(() => ws.broadcast(ws.RefetchGraph)))
    server.start()
    try {
      val client = new WsClient(ws.boundPort)
      assert(client.handshakeStatus == 101)
      // give the server's reader loop a beat to register the client
      val deadline = System.currentTimeMillis() + 5000
      while (ws.connectedClients == 0 &&
             System.currentTimeMillis() < deadline) Thread.sleep(10)
      assert(ws.connectedClients == 1)
      // ping/pong proves the frame loop is alive both ways
      client.sendPing("hi".getBytes(UTF_8))
      assert(new String(client.readPong(), UTF_8) == "hi")
      // the daemon-side contract: NO timer — reconcile only when the
      // push channel says so
      val spec = specJson(tmp, "w1")
      assert(httpPost(
        s"http://127.0.0.1:${server.boundPort}/specs/w", spec) == 200)
      assert(client.readText() == "RefetchGraph") // the push arrived
      val (started, _, _) = watcher.poll() // the reconcile the push triggers
      assert(started == Set(PipelineSpec.fromJson(spec).specHash))
      assert(spark.read.parquet(s"$tmp/out_w1").count() == 5)
      client.close()
    } finally { server.stop(); ws.stop() }
  }

  test("daemon client + wake monitor: push reconciles far inside the poll interval") {
    val tmp = Files.createTempDirectory("graft_wsc").toString
    val specDir = Files.createTempDirectory("graft_wsc_specs")
    val orch = new Orchestrator(spark, restartBackoffMs = 10)
    val watcher = new SpecDirWatcher(orch, specDir)
    val ws = new SpecPushWs()
    ws.start()
    val server = new SpecPushServer(specDir, port = 0,
      onChange = Some(() => ws.broadcast(ws.RefetchGraph)))
    server.start()
    val wake = new Object
    @volatile var stopFlag = false
    val client = new SpecPushWsClient("127.0.0.1", ws.boundPort,
      onMessage = _ => wake.synchronized { wake.notifyAll() })
    val ct = new Thread(() => client.run(() => stopFlag, reconnectMs = 100))
    ct.setDaemon(true); ct.start()
    // the daemon loop: a poll interval FAR longer than the test — only a
    // push-driven wake can reconcile in time
    val wt = new Thread(() => watcher.watch(intervalMs = 120000L,
      maxRounds = 1000, stop = () => stopFlag, wake = Some(wake)))
    wt.setDaemon(true); wt.start()
    try {
      val deadline0 = System.currentTimeMillis() + 5000
      while (ws.connectedClients == 0 &&
             System.currentTimeMillis() < deadline0) Thread.sleep(10)
      assert(ws.connectedClients == 1, "daemon client never connected")
      val spec = specJson(tmp, "wc1")
      assert(httpPost(
        s"http://127.0.0.1:${server.boundPort}/specs/wc", spec) == 200)
      // reconciled well inside the 120s interval = the wake worked
      val deadline = System.currentTimeMillis() + 15000
      var ok = false
      while (!ok && System.currentTimeMillis() < deadline) {
        ok = try spark.read.parquet(s"$tmp/out_wc1").count() == 5
          catch { case _: Exception => false }
        if (!ok) Thread.sleep(100)
      }
      assert(ok, "push-driven wake did not reconcile inside the window")
    } finally {
      stopFlag = true
      wake.synchronized { wake.notifyAll() }
      server.stop(); ws.stop()
    }
  }

  test("bearer token gates the upgrade handshake") {
    val ws = new SpecPushWs(token = Some("ws-secret"))
    ws.start()
    try {
      assert(new WsClient(ws.boundPort).handshakeStatus == 401)
      assert(new WsClient(ws.boundPort,
        auth = Some("wrong")).handshakeStatus == 401)
      val ok = new WsClient(ws.boundPort, auth = Some("ws-secret"))
      assert(ok.handshakeStatus == 101)
      ok.close()
    } finally ws.stop()
  }

  test("wss: same TlsConfig as the HTTP listener — certified client pushes " +
       "through, certless handshake fails") {
    // keytool-generated mutual identities (the MtlsSpec recipe)
    val keytoolBin = java.nio.file.Paths
      .get(sys.props("java.home"), "bin", "keytool").toString
    val pass = "changeit1"
    def keytool(args: String*): Unit = {
      val pb = new ProcessBuilder((keytoolBin +: args): _*)
      pb.redirectErrorStream(true)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(), UTF_8)
      assert(p.waitFor() == 0, s"keytool failed:\n$out")
    }
    val dir = Files.createTempDirectory("ws_tls")
    def identity(name: String): (java.nio.file.Path, java.nio.file.Path) = {
      val ks = dir.resolve(s"$name.p12")
      keytool("-genkeypair", "-alias", name, "-keyalg", "RSA", "-keysize",
        "2048", "-validity", "1", "-dname", s"CN=$name",
        "-ext", "san=ip:127.0.0.1", "-storetype", "PKCS12",
        "-keystore", ks.toString, "-storepass", pass)
      val cert = dir.resolve(s"$name.cer")
      keytool("-exportcert", "-alias", name, "-keystore", ks.toString,
        "-storepass", pass, "-file", cert.toString)
      (ks, cert)
    }
    def truststore(name: String, cert: java.nio.file.Path): java.nio.file.Path = {
      val ts = dir.resolve(s"$name.p12")
      keytool("-importcert", "-alias", "peer", "-file", cert.toString,
        "-storetype", "PKCS12", "-keystore", ts.toString,
        "-storepass", pass, "-noprompt")
      ts
    }
    val (serverKs, serverCert) = identity("wsserver")
    val (clientKs, clientCert) = identity("wsclient")
    val serverTrust = truststore("strust", clientCert)
    val clientTrust = truststore("ctrust", serverCert)
    val ws = new SpecPushWs(tls = Some(TlsConfig(
      serverKs, pass.toCharArray, serverTrust, pass.toCharArray)))
    ws.start()
    try {
      def sslSock(keystore: Option[java.nio.file.Path])(port: Int): java.net.Socket = {
        val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
          javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
        val tks = java.security.KeyStore.getInstance("PKCS12")
        val tin = Files.newInputStream(clientTrust)
        try tks.load(tin, pass.toCharArray) finally tin.close()
        tmf.init(tks)
        val kms = keystore.map { p =>
          val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
            javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
          val ks = java.security.KeyStore.getInstance("PKCS12")
          val kin = Files.newInputStream(p)
          try ks.load(kin, pass.toCharArray) finally kin.close()
          kmf.init(ks, pass.toCharArray)
          kmf.getKeyManagers
        }.orNull
        val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
        ctx.init(kms, tmf.getTrustManagers, null)
        val s = ctx.getSocketFactory.createSocket("127.0.0.1", port)
          .asInstanceOf[javax.net.ssl.SSLSocket]
        s.startHandshake()
        s
      }
      // certified client: full upgrade + push received over TLS
      val ok = new WsClient(ws.boundPort, sockOf = sslSock(Some(clientKs)))
      assert(ok.handshakeStatus == 101)
      val deadline = System.currentTimeMillis() + 5000
      while (ws.connectedClients == 0 &&
             System.currentTimeMillis() < deadline) Thread.sleep(10)
      ws.broadcast(ws.RefetchGraph)
      assert(ok.readText() == "RefetchGraph")
      ok.close()
      // certless client: the TLS handshake itself fails — the upgrade
      // request never reaches the websocket layer
      intercept[java.io.IOException] {
        new WsClient(ws.boundPort, sockOf = sslSock(scala.None))
      }
    } finally ws.stop()
  }

  test("dead client is dropped on broadcast; live one keeps receiving") {
    val ws = new SpecPushWs()
    ws.start()
    try {
      val a = new WsClient(ws.boundPort)
      val b = new WsClient(ws.boundPort)
      assert(a.handshakeStatus == 101 && b.handshakeStatus == 101)
      val deadline = System.currentTimeMillis() + 5000
      while (ws.connectedClients < 2 &&
             System.currentTimeMillis() < deadline) Thread.sleep(10)
      a.close()
      // first broadcast may hit the closed socket (or the reader loop
      // already reaped it); by the second, only the live client remains
      ws.broadcast("one")
      ws.broadcast("two")
      val got = Seq(b.readText(), b.readText())
      assert(got == Seq("one", "two"))
      val reaped = System.currentTimeMillis() + 5000
      while (ws.connectedClients > 1 &&
             System.currentTimeMillis() < reaped) Thread.sleep(10)
      assert(ws.connectedClients == 1)
      b.close()
    } finally ws.stop()
  }
}
