package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Daemon presence parity with the reference's DaemonTracker
  * (`control_plane/src/app/daemon_tracker.rs`, surfaced through
  * `list_daemons`'s Online/Offline merge, `daemon_set_last_seen` on
  * socket close, and `delete_daemon`'s live-socket shutdown): a
  * connected daemon shows `Online` in `GET /daemon`, disconnect flips
  * it `Offline` and stamps `last_seen`, unknown ids are rejected at the
  * ws handshake, anonymous (id-less) clients stay accepted untracked,
  * and deleting a daemon kicks its live connection. */
class DaemonPresenceSpec extends AnyFunSuite {

  private def http(method: String, url: String,
                   auth: Option[String] = None): (Int, String) = {
    val c = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    c.setRequestMethod(method)
    auth.foreach(t => c.setRequestProperty("Authorization", s"Bearer $t"))
    val code = c.getResponseCode
    val is = if (code < 400) c.getInputStream else c.getErrorStream
    val text = if (is == null) "" else new String(is.readAllBytes(), "UTF-8")
    (code, text)
  }

  /** A control plane holding one joined daemon record (written in the
    * store's own on-disk format — exercising the read path). */
  private def cpWithDaemon(id: String): ControlPlane = {
    val stateDir = Files.createTempDirectory("presence_state")
    Files.writeString(stateDir.resolve("daemons.json"),
      s"""[{"id":"$id","joined_at":1000}]""")
    new ControlPlane(stateDir)
  }

  private def await(cond: () => Boolean, ms: Long = 5000): Boolean = {
    val end = System.currentTimeMillis() + ms
    while (!cond() && System.currentTimeMillis() < end) Thread.sleep(20)
    cond()
  }

  test("connect -> Online; disconnect -> Offline with last_seen stamped") {
    val cp = cpWithDaemon("d-1")
    val presence = new DaemonPresence(cp, now = () => 424242L)
    val ws = new SpecPushWs(presence = Some(presence))
    val server = new SpecPushServer(Files.createTempDirectory("presence_specs"),
      port = 0, control = Some(cp), presence = Some(presence))
    ws.start(); server.start()
    val base = s"http://127.0.0.1:${server.boundPort}"
    try {
      @volatile var stop = false
      val client = new SpecPushWsClient("127.0.0.1", ws.boundPort,
        onMessage = _ => (), extraHeaders = Seq("X-Graft-Daemon" -> "d-1"))
      val t = new Thread(() => client.run(() => stop, reconnectMs = 100))
      t.setDaemon(true); t.start()
      assert(await(() => presence.isOnline("d-1")), "daemon never came online")
      val (c1, b1) = http("GET", s"$base/daemon")
      assert(c1 == 200 && b1.contains(""""status":"Online""""), b1)
      assert(b1.contains(""""last_seen":null"""), b1)
      stop = true
      assert(await(() => !presence.isOnline("d-1")), "daemon never went offline")
      val (c2, b2) = http("GET", s"$base/daemon")
      assert(c2 == 200 && b2.contains(""""status":"Offline""""), b2)
      assert(b2.contains(""""last_seen":424242"""), b2)
      // the stamp is durable: a fresh read of the store sees it
      assert(cp.listDaemons().head.lastSeen.contains(424242L))
    } finally { server.stop(); ws.stop() }
  }

  test("registry survives concurrent connect/disconnect churn") {
    // the old check-then-act disconnected() could remove a set a
    // concurrent connected() had just registered into — a live daemon
    // reading Offline. Hammer the per-key compute paths from many
    // threads; the invariant: after every thread's connects have a
    // matching disconnect EXCEPT one survivor, the daemon is Online,
    // and after the survivor closes it is Offline.
    val cp = cpWithDaemon("d-c")
    val presence = new DaemonPresence(cp)
    val survivor = new java.net.Socket()
    assert(presence.connected("d-c", survivor))
    val threads = (0 until 8).map { _ =>
      new Thread(() => {
        (0 until 500).foreach { _ =>
          val s = new java.net.Socket()
          presence.connected("d-c", s)
          presence.disconnected("d-c", s)
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(presence.isOnline("d-c"),
      "churn dropped a still-connected socket's registration")
    presence.disconnected("d-c", survivor)
    assert(!presence.isOnline("d-c"))
  }

  test("unknown daemon id is rejected at the handshake; anonymous accepted") {
    val cp = cpWithDaemon("d-1")
    val presence = new DaemonPresence(cp)
    val ws = new SpecPushWs(presence = Some(presence))
    ws.start()
    try {
      val bad = new SpecPushWsClient("127.0.0.1", ws.boundPort,
        onMessage = _ => (), extraHeaders = Seq("X-Graft-Daemon" -> "ghost"))
      val ex = intercept[java.io.IOException] { bad.connectOnce(() => false) }
      assert(ex.getMessage.contains("403"), ex.getMessage)
      assert(!presence.isOnline("ghost"))
      // anonymous client (no id header): accepted, untracked — the
      // pre-presence notification-only behavior
      @volatile var opened = false
      @volatile var stop = false
      val anon = new SpecPushWsClient("127.0.0.1", ws.boundPort,
        onMessage = _ => (), onOpen = () => opened = true)
      val t = new Thread(() => anon.run(() => stop, reconnectMs = 100))
      t.setDaemon(true); t.start()
      assert(await(() => opened && ws.connectedClients > 0))
      stop = true
    } finally ws.stop()
  }

  test("mTLS: the VERIFIED peer cert CN is the daemon identity (no header)") {
    val keytoolBin = java.nio.file.Paths
      .get(sys.props("java.home"), "bin", "keytool").toString
    val pass = "changeit1"
    def keytool(args: String*): Unit = {
      val pb = new ProcessBuilder((keytoolBin +: args): _*)
      pb.redirectErrorStream(true)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      assert(p.waitFor() == 0, s"keytool failed:\n$out")
    }
    val dir = Files.createTempDirectory("presence_tls")
    def identity(name: String): (java.nio.file.Path, java.nio.file.Path) = {
      val ks = dir.resolve(s"$name.p12")
      keytool("-genkeypair", "-alias", name, "-keyalg", "RSA", "-keysize",
        "2048", "-validity", "1", "-dname", s"CN=$name",
        "-ext", "san=ip:127.0.0.1",
        "-storetype", "PKCS12", "-keystore", ks.toString, "-storepass", pass)
      val cert = dir.resolve(s"$name.cer")
      keytool("-exportcert", "-alias", name, "-keystore", ks.toString,
        "-storepass", pass, "-file", cert.toString)
      (ks, cert)
    }
    def trust(name: String, cert: java.nio.file.Path): java.nio.file.Path = {
      val ts = dir.resolve(s"$name.p12")
      keytool("-importcert", "-alias", "peer", "-file", cert.toString,
        "-storetype", "PKCS12", "-keystore", ts.toString,
        "-storepass", pass, "-noprompt")
      ts
    }
    val (serverKs, serverCert) = identity("wsserver")
    val (clientKs, clientCert) = identity("d-tls") // CN IS the daemon id
    val serverTrust = trust("strust", clientCert)
    val clientTrust = trust("ctrust", serverCert)
    val cp = cpWithDaemon("d-tls")
    val presence = new DaemonPresence(cp, now = () => 777L)
    val ws = new SpecPushWs(
      tls = Some(TlsConfig(serverKs, pass.toCharArray,
        serverTrust, pass.toCharArray)),
      presence = Some(presence))
    ws.start()
    try {
      @volatile var stop = false
      val client = new SpecPushWsClient("127.0.0.1", ws.boundPort,
        onMessage = _ => (),
        tls = Some(TlsConfig(clientKs, pass.toCharArray,
          clientTrust, pass.toCharArray)))
      val t = new Thread(() => client.run(() => stop, reconnectMs = 200))
      t.setDaemon(true); t.start()
      assert(await(() => presence.isOnline("d-tls")),
        "cert-CN daemon never came online")
      stop = true
      assert(await(() => !presence.isOnline("d-tls")))
      assert(cp.listDaemons().head.lastSeen.contains(777L))
    } finally ws.stop()
  }

  test("DELETE /daemon kicks the live connection and it stays gone") {
    val cp = cpWithDaemon("d-9")
    val presence = new DaemonPresence(cp)
    val ws = new SpecPushWs(presence = Some(presence))
    val server = new SpecPushServer(Files.createTempDirectory("presence_specs"),
      port = 0, token = Some("admin"), control = Some(cp),
      presence = Some(presence))
    ws.start(); server.start()
    val base = s"http://127.0.0.1:${server.boundPort}"
    try {
      @volatile var stop = false
      val client = new SpecPushWsClient("127.0.0.1", ws.boundPort,
        onMessage = _ => (), extraHeaders = Seq("X-Graft-Daemon" -> "d-9"))
      val t = new Thread(() => client.run(() => stop, reconnectMs = 200))
      t.setDaemon(true); t.start()
      assert(await(() => presence.isOnline("d-9")))
      val (dc, _) = http("DELETE", s"$base/daemon/d-9", auth = Some("admin"))
      assert(dc == 200)
      // kicked now, and the deleted record cannot re-register: the
      // client's reconnect loop keeps getting 403 (unknown daemon)
      assert(await(() => !presence.isOnline("d-9")), "kick did not close")
      Thread.sleep(600) // at least one reconnect attempt
      assert(!presence.isOnline("d-9"))
      val (_, lst) = http("GET", s"$base/daemon")
      assert(!lst.contains("d-9"))
      stop = true
    } finally { server.stop(); ws.stop() }
  }
}
