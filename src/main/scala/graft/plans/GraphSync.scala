package graft.plans

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardCopyOption}
import com.fasterxml.jackson.databind.ObjectMapper

/** In-band spec-graph delivery over the push websocket — the protocol
  * half of the reference's daemon socket, where a daemon sends
  * `GetGraph` and the control plane answers `GetGraphResponse{graph}`
  * with the graph itself
  * (`control_plane/src/http/daemon_api/mod.rs:63-68,117-121`; message
  * JSON is `{"message": <variant>, ...}` per its serde tag). With this,
  * a daemon pointed only at host:port — no shared spec directory —
  * bootstraps and reconciles purely from the socket.
  *
  * The graph payload here is graft's dialect: `graph` maps each spec
  * FILE name (without `.json`; workspace members keep their `ws__name`
  * prefix) to the spec's parsed JSON — SECRET-REAL, because a daemon
  * must run the real config (the redacted form is the HTTP display
  * surface, not this channel; the socket is bearer/mTLS-gated).
  *
  * [[GraphSyncDaemon]] keeps ONE code path for what runs: it
  * materializes the received graph into a PRIVATE local directory and
  * drives the same [[SpecDirWatcher]] reconcile loop as a filesystem
  * daemon — start/keep/stop semantics, crash-replay, and ack discipline
  * are the watcher's, not reimplemented per transport. */
object GraphSync {
  val GetGraph = "GetGraph"
  val GetGraphResponse = "GetGraphResponse"

  // thread-safe after construction; building one per call (worse, one
  // per graph ENTRY) is the expensive part of Jackson
  private val mapper = new ObjectMapper()

  /** Is this inbound text a graph request? Accepts the tagged JSON form
    * (`{"message":"GetGraph"}`) and the bare string. */
  def isGetGraph(msg: String): Boolean =
    msg.trim == GetGraph || {
      try mapper.readTree(msg).path("message").asText("") == GetGraph
      catch { case _: Exception => false }
    }

  /** The `GetGraph` request in the tagged-JSON wire form. */
  def getGraphRequest: String = s"""{"message":"$GetGraph"}"""

  /** Render the watched spec dir as a `GetGraphResponse`: every `*.json`
    * (dot-files — push temp files, the control-plane state dir — are
    * never specs) embedded VERBATIM as a JSON string under its file
    * name. String-embed, not parse-embed, deliberately: the daemon must
    * see exactly what a filesystem daemon would read from the dir — an
    * invalid spec ships as-is and the DAEMON-side watcher applies its
    * last-known-good policy, identical to the server-side watcher,
    * instead of one bad file bricking every dir-less daemon's GetGraph.
    * A file deleted between list and read (a concurrent DELETE) is
    * skipped — the next RefetchGraph-triggered sync sees the final
    * state. */
  def graphResponseJson(dir: Path): String = {
    val root = mapper.createObjectNode()
    root.put("message", GetGraphResponse)
    val graph = root.putObject("graph")
    import scala.jdk.CollectionConverters._
    val s = Files.list(dir)
    val names =
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.endsWith(".json") && !n.startsWith(".")).toSeq.sorted
      finally s.close()
    names.foreach { n =>
      try graph.put(n.stripSuffix(".json"),
        Files.readString(dir.resolve(n), UTF_8))
      catch { case _: java.io.IOException => () } // deleted mid-listing
    }
    mapper.writeValueAsString(root)
  }

  /** Parse a `GetGraphResponse` into name → raw spec text; None when
    * the message is anything else (e.g. the RefetchGraph notification).
    * Object-valued entries (an older parse-embedding peer) are rendered
    * back to compact JSON. */
  def parseGraphResponse(msg: String): Option[Map[String, String]] =
    try {
      val node = mapper.readTree(msg)
      if (node.path("message").asText("") != GetGraphResponse) scala.None
      else {
        val g = node.path("graph")
        if (!g.isObject) scala.None
        else {
          val b = Map.newBuilder[String, String]
          val it = g.fields()
          while (it.hasNext) {
            val e = it.next()
            b += e.getKey -> (if (e.getValue.isTextual) e.getValue.asText()
              else mapper.writeValueAsString(e.getValue))
          }
          Some(b.result())
        }
      }
    } catch { case _: Exception => scala.None }

  /** Materialize a received graph into the daemon's PRIVATE spec dir so
    * the [[SpecDirWatcher]] reconcile loop can diff it: each entry lands
    * atomically (tmp + rename — the watcher must never read a torn
    * spec), local `*.json` files absent from the graph are deleted
    * (their pipelines stop on the next poll). Names that could escape
    * the dir or collide with push temp files are REJECTED loudly — the
    * server is authenticated, but a compromised server must not write
    * outside the sandbox dir. */
  def materialize(dir: Path, graph: Map[String, String]): Unit = {
    val NamePat = "[A-Za-z0-9._-]+".r
    graph.keys.foreach { n =>
      require(NamePat.matches(n) && !n.contains("..") && !n.startsWith("."),
        s"refusing graph entry with unsafe spec name '$n'")
    }
    Files.createDirectories(dir)
    graph.foreach { case (n, spec) =>
      val p = dir.resolve(s"$n.json")
      val tmp = p.resolveSibling(s".${p.getFileName}.sync")
      Files.writeString(tmp, spec, UTF_8)
      Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
    import scala.jdk.CollectionConverters._
    val s = Files.list(dir)
    val stale =
      try s.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".json") &&
          !p.getFileName.toString.startsWith(".") &&
          !graph.contains(p.getFileName.toString.stripSuffix(".json")))
        .toSeq
      finally s.close()
    stale.foreach(Files.delete)
  }
}

/** A DIR-LESS daemon: holds the wss connection, bootstraps the spec
  * graph over it (`GetGraph` on every (re)connect — a reconnect may have
  * missed pushes), re-requests on each `RefetchGraph`, materializes into
  * its private `localDir`, and signals `onSync` so the owner can drive
  * its [[SpecDirWatcher]].poll(). The owner supplies the watcher/
  * orchestrator; this class owns only transport + materialization. */
final class GraphSyncDaemon(host: String, port: Int, localDir: Path,
                            onSync: () => Unit,
                            tls: Option[TlsConfig] = scala.None,
                            token: Option[String] = scala.None,
                            reconnectMs: Long = 1000L,
                            daemonId: Option[String] = scala.None) {
  @volatile private var stopped = false
  @volatile private var syncs = 0L

  /** Completed graph syncs — lets a test (or health check) await the
    * bootstrap without sleeping. */
  def syncCount: Long = syncs

  private val client: SpecPushWsClient = new SpecPushWsClient(
    host, port,
    // the whole handler is fenced: SpecPushWsClient.run reconnects only
    // on IOException, so a materialize/reconcile throw (unsafe graph
    // name, a sink failure inside onSync) escaping here would KILL the
    // sync thread permanently — the daemon would keep running stale
    // local specs with no re-sync and no error. A bad graph must be a
    // logged, retried-on-next-push condition, not a silent outage.
    onMessage = msg => try {
      GraphSync.parseGraphResponse(msg) match {
        case Some(graph) =>
          GraphSync.materialize(localDir, graph)
          onSync()
          syncs += 1 // incremented AFTER the reconcile — awaiting
                     // syncCount means the pipelines have been acted on
        case scala.None =>
          // RefetchGraph (or anything unrecognized): the graph may have
          // changed — re-request rather than trust a payload
          if (msg.contains("RefetchGraph")) client.send(GraphSync.getGraphRequest)
      }
    } catch {
      case e: java.io.IOException => throw e // socket-dead: reconnect path
      case e: Exception =>
        System.err.println(s"[graft graph-sync] sync failed (will retry " +
          s"on next push/reconnect): ${e.getMessage}")
    },
    tls = tls, token = token,
    onOpen = () => client.send(GraphSync.getGraphRequest),
    // bearer-mode identity for the control plane's presence tracking
    // (mTLS daemons are identified by their cert CN instead)
    extraHeaders = daemonId.map("X-Graft-Daemon" -> _).toSeq)

  private val thread = new Thread(() =>
    client.run(() => stopped, reconnectMs), "graft-graph-sync")
  thread.setDaemon(true)

  def start(): Unit = thread.start()
  def stop(): Unit = { stopped = true }
}
