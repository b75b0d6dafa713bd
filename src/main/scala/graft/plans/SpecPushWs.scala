package graft.plans

import java.io.{InputStream, OutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

/** Push control channel — the transport half of the reference's
  * daemon_api websocket (`control_plane/src/http/daemon_api/mod.rs:146-148`,
  * where the control plane pushes `RefetchGraph` to connected daemons over
  * wss so they reconcile IMMEDIATELY instead of on their next poll). A
  * minimal RFC 6455 server: HTTP/1.1 upgrade handshake (`Sec-WebSocket-Key`
  * → SHA-1+base64 accept), server→client TEXT frames for notifications,
  * client PING answered with PONG, CLOSE echoed and the peer dropped.
  *
  * The JDK's `com.sun.net.httpserver` cannot hand over its socket for an
  * upgrade, so this is a SIBLING listener next to [[SpecPushServer]]'s
  * HTTP routes, sharing the same [[TlsConfig]] material (same keystore,
  * same truststore, same needClientAuth) — one PKI, two sockets. Poll via
  * [[SpecDirWatcher]] stays as the fallback for daemons that never
  * connect.
  *
  * IN-BAND GRAPH DELIVERY (`graphProvider`): the reference daemon
  * socket is bidirectional — a daemon sends `GetGraph` and the control
  * plane answers `GetGraphResponse{graph}` with the spec graph ITSELF
  * (`control_plane/src/http/daemon_api/mod.rs:66-68,117-135`), so a
  * daemon with no filesystem path to the spec dir bootstraps purely off
  * the socket. When `graphProvider` is set, a client TEXT frame whose
  * JSON `message` is `GetGraph` (or the bare string) is answered on
  * that socket with the provider's response — SECRET-REAL, unlike the
  * redacted HTTP `GET /specs/<name>` display surface: this channel is
  * daemon-facing (bearer/mTLS-gated), and a daemon must run the real
  * config. Without a provider, inbound text stays ignored and the
  * channel is notification-only (the pre-round-13 behavior).
  *
  * `token`: when set, the upgrade request must carry
  * `Authorization: Bearer <token>` (constant-time compare) or the
  * handshake answers 401 — matching the HTTP routes' bearer discipline.
  */
final class SpecPushWs(port: Int = 0, host: String = "127.0.0.1",
                       tls: Option[TlsConfig] = scala.None,
                       token: Option[String] = scala.None,
                       graphProvider: Option[() => String] = scala.None,
                       presence: Option[DaemonPresence] = scala.None,
                       allowInsecureGraphDelivery: Boolean = false) {
  // graph delivery ships SECRET-REAL configs; a bearer token
  // authenticates but does not encrypt, so a non-loopback bind without
  // TLS would put credentials on the wire in cleartext (the reference
  // channel is always wss). Refuse at construction unless explicitly
  // overridden — a misconfigured daemon fleet should fail to start, not
  // leak.
  require(graphProvider.isEmpty || tls.nonEmpty ||
    allowInsecureGraphDelivery ||
    java.net.InetAddress.getByName(host).isLoopbackAddress,
    s"SpecPushWs: graph delivery on non-loopback host '$host' requires " +
    "TLS (graphProvider responses carry real secrets; a bearer token " +
    "does not encrypt). Configure `tls`, bind loopback, or set " +
    "allowInsecureGraphDelivery=true to accept cleartext delivery.")

  /** The notification the reference pushes on spec-graph change. */
  val RefetchGraph = "RefetchGraph"

  private val server: ServerSocket = tls match {
    case Some(cfg) =>
      val s = TlsConfig.sslContext(cfg).getServerSocketFactory
        .createServerSocket().asInstanceOf[javax.net.ssl.SSLServerSocket]
      s.setNeedClientAuth(cfg.needClientAuth)
      s.bind(new InetSocketAddress(host, port))
      s
    case scala.None =>
      val s = new ServerSocket()
      s.bind(new InetSocketAddress(host, port))
      s
  }

  def boundPort: Int = server.getLocalPort

  private val clients =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Socket]()
  @volatile private var running = false

  def connectedClients: Int = clients.size()

  def start(): Unit = synchronized {
    if (running) return
    running = true
    val t = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          val h = new Thread(() => serve(sock), "graft-ws-conn")
          h.setDaemon(true); h.start()
        } catch { case _: Exception => () } // closed on stop()
      }
    }, "graft-ws-accept")
    t.setDaemon(true)
    t.start()
  }

  def stop(): Unit = synchronized {
    running = false
    try server.close() catch { case _: Exception => () }
    clients.forEach(s => try s.close() catch { case _: Exception => () })
    clients.clear()
  }

  /** One unmasked server→client TEXT frame with full RFC 6455 length
    * encoding (7-bit / 16-bit / 64-bit) — notifications fit the short
    * form, `GetGraphResponse` payloads generally do not. */
  private def textFrame(msg: String): Array[Byte] = {
    val p = msg.getBytes(UTF_8)
    val header: Array[Byte] =
      if (p.length < 126) Array(0x81.toByte, p.length.toByte)
      else if (p.length < 65536) Array(0x81.toByte, 126.toByte,
        ((p.length >> 8) & 0xff).toByte, (p.length & 0xff).toByte)
      else Array(0x81.toByte, 127.toByte) ++
        (56 to 0 by -8).map(s => ((p.length.toLong >> s) & 0xff).toByte)
    header ++ p
  }

  /** Send a TEXT frame to every connected client; peers whose socket is
    * dead are dropped (their daemon falls back to the poll loop). */
  def broadcast(msg: String): Unit = {
    val frame = textFrame(msg)
    clients.forEach { s =>
      try s.synchronized {
        s.getOutputStream.write(frame); s.getOutputStream.flush()
      } catch { case _: Exception =>
        clients.remove(s); try s.close() catch { case _: Exception => () }
      }
    }
  }

  // ---- one connection: handshake then a frame-reader loop ----

  private def serve(sock: Socket): Unit = {
    try {
      // pre-auth read deadline: a client that connects and sends nothing
      // must not pin this thread (and a pre-auth socket) forever
      sock.setSoTimeout(10000)
      val in = sock.getInputStream
      val out = sock.getOutputStream
      val headers = readRequestHead(in) match {
        case Some(h) => h
        case scala.None => sock.close(); return
      }
      def bad(code: Int, text: String): Unit = {
        out.write((s"HTTP/1.1 $code $text\r\nConnection: close\r\n" +
          "Content-Length: 0\r\n\r\n").getBytes(UTF_8))
        out.flush(); sock.close()
      }
      val authorized = token match {
        case scala.None => true
        case Some(t) => headers.get("authorization") match {
          case Some(h) if h.startsWith("Bearer ") =>
            java.security.MessageDigest.isEqual(
              h.stripPrefix("Bearer ").getBytes(UTF_8), t.getBytes(UTF_8))
          case _ => false
        }
      }
      if (!authorized) { bad(401, "Unauthorized"); return }
      if (!headers.get("upgrade").exists(_.equalsIgnoreCase("websocket"))) {
        bad(400, "Bad Request"); return
      }
      val key = headers.get("sec-websocket-key") match {
        case Some(k) => k
        case scala.None => bad(400, "Bad Request"); return
      }
      // DAEMON IDENTITY for presence tracking: the mTLS peer CN when a
      // client certificate was verified (the reference's PeerInfo
      // common_name), else the X-Graft-Daemon header (bearer mode's
      // self-report — the channel is already credential-gated). A
      // presence-tracked listener REJECTS ids the control plane has no
      // record of (reference daemon_connected errors for unknown ids);
      // anonymous clients stay notification-only and untracked.
      val did: Option[String] =
        peerCommonName(sock).orElse(headers.get("x-graft-daemon"))
      // UNKNOWN ids are rejected BEFORE the handshake (403, never a 101);
      // registration itself waits until the 101 is ON THE WIRE — a client
      // that drops mid-handshake must not leave a phantom Online entry
      // (presence would otherwise register a socket whose handshake write
      // throws before the reader loop's finally can deregister it).
      (presence, did) match {
        case (Some(p), Some(id)) if !p.known(id) =>
          bad(403, "Forbidden"); return
        case _ => ()
      }
      val accept = java.util.Base64.getEncoder.encodeToString(
        java.security.MessageDigest.getInstance("SHA-1")
          .digest((key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11")
            .getBytes(UTF_8)))
      var tracked: Option[(DaemonPresence, String)] = scala.None
      try {
        out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
          "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
          s"Sec-WebSocket-Accept: $accept\r\n\r\n").getBytes(UTF_8))
        out.flush()
        sock.setSoTimeout(0) // post-handshake the reader may idle for hours
        tracked = (presence, did) match {
          case (Some(p), Some(id)) =>
            // deleted between the screen and here: treat as kicked
            if (p.connected(id, sock)) Some((p, id))
            else { sock.close(); return }
          case _ => scala.None
        }
        clients.add(sock)
        readerLoop(sock, in, out)
      } finally tracked.foreach { case (p, id) => p.disconnected(id, sock) }
    } catch { case _: Exception =>
      clients.remove(sock)
      try sock.close() catch { case _: Exception => () }
    }
  }

  /** CN of a VERIFIED client certificate, when this is an mTLS socket
    * with client auth — the identity the reference's daemon API trusts
    * (`tls_server::PeerInfo.common_name`). */
  private def peerCommonName(sock: Socket): Option[String] = sock match {
    case s: javax.net.ssl.SSLSocket =>
      try {
        import scala.jdk.CollectionConverters._
        new javax.naming.ldap.LdapName(s.getSession.getPeerPrincipal.getName)
          .getRdns.asScala
          .find(_.getType.equalsIgnoreCase("CN")).map(_.getValue.toString)
      } catch { case _: Exception => scala.None } // no/unverified peer cert
    case _ => scala.None
  }

  /** Read request line + headers up to the blank line (lowercased keys). */
  private def readRequestHead(in: InputStream): Option[Map[String, String]] = {
    val sb = new StringBuilder
    var prev = 0
    var b = in.read()
    while (b != -1 && !(prev == '\n' && (b == '\r' || b == '\n'))) {
      sb.append(b.toChar)
      if (b != '\r') prev = b
      b = in.read()
      if (sb.length > 16384) return scala.None // header bomb guard
    }
    if (b == '\r') in.read() // trailing \n of the blank line
    val lines = sb.toString.split("\r?\n").toSeq
    if (lines.isEmpty || !lines.head.startsWith("GET ")) return scala.None
    Some(lines.tail.flatMap { l =>
      l.indexOf(':') match {
        case -1 => scala.None
        case i => Some(l.substring(0, i).trim.toLowerCase ->
          l.substring(i + 1).trim)
      }
    }.toMap)
  }

  /** Handle inbound frames: PING → PONG, CLOSE → echo + drop; client data
    * frames are ignored (this channel only notifies downward). */
  // (reader loop below; the daemon-side CLIENT lives in SpecPushWsClient)
  private def readerLoop(sock: Socket, in: InputStream,
                         out: OutputStream): Unit = {
    def readN(n: Int): Option[Array[Byte]] = {
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(buf, off, n - off)
        if (r < 0) return scala.None
        off += r
      }
      Some(buf)
    }
    var open = true
    while (open && running) {
      readN(2) match {
        case scala.None => open = false
        case Some(h) =>
          val opcode = h(0) & 0x0f
          val masked = (h(1) & 0x80) != 0
          var len: Long = h(1) & 0x7f
          if (len == 126) len = readN(2).map(b =>
            ((b(0) & 0xffL) << 8) | (b(1) & 0xffL)).getOrElse(-1L)
          else if (len == 127) len = readN(8).map(_.foldLeft(0L)(
            (acc, x) => (acc << 8) | (x & 0xffL))).getOrElse(-1L)
          if (len < 0 || len > (1L << 20)) open = false // oversized: drop
          // RFC 6455 §5.5: control frames carry at most 125 payload
          // bytes — echoing a longer ping with a one-byte length field
          // would emit a malformed frame, so reject the peer instead
          else if (opcode >= 0x8 && len > 125) open = false
          else {
            val mask = if (masked) readN(4) else Some(Array.empty[Byte])
            val payload = readN(len.toInt)
            (mask, payload) match {
              case (Some(m), Some(p)) =>
                if (masked) p.indices.foreach(i =>
                  p(i) = (p(i) ^ m(i % 4)).toByte)
                opcode match {
                  case 0x8 => // close: echo, then drop
                    try sock.synchronized {
                      out.write(Array(0x88.toByte, 0x00.toByte)); out.flush()
                    } catch { case _: Exception => () }
                    open = false
                  case 0x9 => // ping → pong with same payload
                    try sock.synchronized {
                      out.write(Array(0x8a.toByte, p.length.toByte))
                      out.write(p); out.flush()
                    } catch { case _: Exception => open = false }
                  case 0x1 => // client text: GetGraph → the spec graph
                    graphProvider match {
                      case Some(provider)
                          if GraphSync.isGetGraph(new String(p, UTF_8)) =>
                        try sock.synchronized {
                          out.write(textFrame(provider())); out.flush()
                        } catch { case _: Exception => open = false }
                      case _ => () // no provider / other text: ignored
                    }
                  case _ => () // binary/pong from client: ignored
                }
              case _ => open = false
            }
          }
      }
    }
    clients.remove(sock)
    try sock.close() catch { case _: Exception => () }
  }
}

/** Daemon-side websocket CLIENT — the other half of the push channel:
  * reference daemons hold a wss connection to the control plane and
  * reconcile the moment `RefetchGraph` arrives
  * (`control_plane/src/http/daemon_api/mod.rs:146-148`; `myceliald`'s
  * client loop). This client connects to a [[SpecPushWs]] listener
  * (optionally over the same [[TlsConfig]] mTLS material), hands every
  * TEXT frame to `onMessage`, and — because a long-lived daemon must
  * survive control-plane restarts — `run` reconnects with a fixed
  * backoff until told to stop. The [[SpecDirWatcher]] poll loop remains
  * the correctness path; this client only shortens reconcile latency.
  */
final class SpecPushWsClient(host: String, port: Int,
                             onMessage: String => Unit,
                             tls: Option[TlsConfig] = scala.None,
                             token: Option[String] = scala.None,
                             onOpen: () => Unit = () => (),
                             maxFrameBytes: Long = 1L << 26,
                             extraHeaders: Seq[(String, String)] = Seq.empty) {
  import java.nio.charset.StandardCharsets.UTF_8

  // the live connection's write side, for [[send]]; None between
  // connections (send then raises, and the caller's reconnect loop —
  // which re-fires onOpen — is the retry path)
  @volatile private var writer: Option[(java.net.Socket, OutputStream)] =
    scala.None

  /** Send one MASKED client→server TEXT frame (RFC 6455 requires client
    * frames masked; full 7/16/64-bit length encoding) on the current
    * connection. Used by daemons to request the graph (`GetGraph`). */
  def send(msg: String): Unit = writer match {
    case scala.None => throw new java.io.IOException("websocket not connected")
    case Some((sock, out)) =>
      val p = msg.getBytes(UTF_8)
      val mask = Array[Byte](5, 6, 7, 8) // static: masking is for proxy
      val header: Array[Byte] =          // cache-busting, not security
        if (p.length < 126) Array(0x81.toByte, (0x80 | p.length).toByte)
        else if (p.length < 65536) Array(0x81.toByte, (0x80 | 126).toByte,
          ((p.length >> 8) & 0xff).toByte, (p.length & 0xff).toByte)
        else Array(0x81.toByte, (0x80 | 127).toByte) ++
          (56 to 0 by -8).map(s => ((p.length.toLong >> s) & 0xff).toByte)
      val masked = p.zipWithIndex.map { case (x, i) =>
        (x ^ mask(i % 4)).toByte }
      sock.synchronized {
        out.write(header); out.write(mask); out.write(masked); out.flush()
      }
  }

  private def openSocket(): java.net.Socket = tls match {
    case Some(cfg) =>
      val s = TlsConfig.sslContext(cfg).getSocketFactory
        .createSocket(host, port).asInstanceOf[javax.net.ssl.SSLSocket]
      s.startHandshake()
      s
    case scala.None => new java.net.Socket(host, port)
  }

  /** One connection: handshake, then dispatch frames until EOF/close.
    * Throws on a non-101 handshake (bad token is not retryable). */
  def connectOnce(stop: () => Boolean = () => false): Unit = {
    val sock = openSocket()
    try {
      val out = sock.getOutputStream
      val in = sock.getInputStream
      val key = java.util.Base64.getEncoder.encodeToString(
        Array.tabulate(16)(i => (i * 37 + 11).toByte)) // static is fine: the
      // nonce exists for proxy-cache busting, not security
      val hdr = new StringBuilder
      hdr.append("GET /ws HTTP/1.1\r\n").append(s"Host: $host\r\n")
      hdr.append("Upgrade: websocket\r\nConnection: Upgrade\r\n")
      hdr.append(s"Sec-WebSocket-Key: $key\r\nSec-WebSocket-Version: 13\r\n")
      token.foreach(t => hdr.append(s"Authorization: Bearer $t\r\n"))
      extraHeaders.foreach { case (k, v) => hdr.append(s"$k: $v\r\n") }
      hdr.append("\r\n")
      out.write(hdr.toString.getBytes(UTF_8)); out.flush()
      val head = new StringBuilder
      var prev = 0; var b = in.read()
      while (b != -1 && !(prev == '\n' && (b == '\r' || b == '\n'))) {
        head.append(b.toChar); if (b != '\r') prev = b; b = in.read()
      }
      if (b == '\r') in.read()
      val status = head.toString.split(" ")(1).toInt
      if (status != 101) throw new java.io.IOException(
        s"websocket upgrade rejected: HTTP $status")
      sock.setSoTimeout(1000) // poll `stop` between frames
      writer = Some((sock, out))
      onOpen()
      def readN(n: Int): Option[Array[Byte]] = {
        val buf = new Array[Byte](n); var off = 0
        while (off < n) {
          val r = in.read(buf, off, n - off)
          if (r < 0) return scala.None
          off += r
        }
        Some(buf)
      }
      var open = true
      while (open && !stop()) {
        val h0 = try in.read() catch {
          case _: java.net.SocketTimeoutException => -2
        }
        if (h0 == -1) open = false
        else if (h0 != -2) {
          val h1 = in.read()
          if (h1 < 0) open = false else {
            var len: Long = h1 & 0x7f
            if (len == 126) len = readN(2).map(x =>
              ((x(0) & 0xffL) << 8) | (x(1) & 0xffL)).getOrElse(-1L)
            else if (len == 127) len = readN(8).map(_.foldLeft(0L)(
              (acc, x) => (acc << 8) | (x & 0xffL))).getOrElse(-1L)
            if (len < 0 || len > maxFrameBytes) open = false
            // RFC 6455 §5.5: a >125-byte control frame is a protocol
            // violation (and unechoable with a one-byte length) — drop
            else if ((h0 & 0x08) != 0 && len > 125) open = false
            else readN(len.toInt) match {
              case Some(p) => (h0 & 0x0f) match {
                case 0x1 => onMessage(new String(p, UTF_8))
                case 0x8 => open = false // server close
                case 0x9 => // server ping → masked pong (client frames mask)
                  val mask = Array[Byte](5, 6, 7, 8)
                  out.write(0x8a); out.write(0x80 | p.length)
                  out.write(mask)
                  out.write(p.zipWithIndex.map { case (x, i) =>
                    (x ^ mask(i % 4)).toByte })
                  out.flush()
                case _ => () // pong/binary: ignored
              }
              case scala.None => open = false
            }
          }
        }
      }
    } finally {
      writer = scala.None
      try sock.close() catch { case _: Exception => () }
    }
  }

  /** Long-lived daemon loop: connect, dispatch, reconnect after
    * `reconnectMs` on ANY connection loss, until `stop`. */
  def run(stop: () => Boolean, reconnectMs: Long = 5000L): Unit =
    while (!stop()) {
      try connectOnce(stop)
      catch { case e: java.io.IOException =>
        System.err.println(s"[graft ws] connection lost: ${e.getMessage}")
      }
      if (!stop()) Thread.sleep(reconnectMs)
    }
}
