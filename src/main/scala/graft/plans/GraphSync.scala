package graft.plans

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardCopyOption}
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

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

  private def mapper = new ObjectMapper()

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
    * never specs) parsed and embedded under its file name. Parse-embed,
    * not string-embed: a spec that no longer parses must fail HERE on
    * the serving side, not corrupt the whole graph for every daemon. */
  def graphResponseJson(dir: Path): String = {
    val m = mapper
    val root = m.createObjectNode()
    root.put("message", GetGraphResponse)
    val graph = root.putObject("graph")
    import scala.jdk.CollectionConverters._
    val s = Files.list(dir)
    val names =
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.endsWith(".json") && !n.startsWith(".")).toSeq.sorted
      finally s.close()
    names.foreach { n =>
      graph.set[ObjectNode](n.stripSuffix(".json"),
        m.readTree(Files.readString(dir.resolve(n), UTF_8)))
    }
    m.writeValueAsString(root)
  }

  /** Parse a `GetGraphResponse` into name → compact spec JSON; None when
    * the message is anything else (e.g. the RefetchGraph notification). */
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
            b += e.getKey -> mapper.writeValueAsString(e.getValue)
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
                            reconnectMs: Long = 1000L) {
  @volatile private var stopped = false
  @volatile private var syncs = 0L

  /** Completed graph syncs — lets a test (or health check) await the
    * bootstrap without sleeping. */
  def syncCount: Long = syncs

  private val client: SpecPushWsClient = new SpecPushWsClient(
    host, port,
    onMessage = msg => {
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
    },
    tls = tls, token = token,
    onOpen = () => client.send(GraphSync.getGraphRequest))

  private val thread = new Thread(() =>
    client.run(() => stopped, reconnectMs), "graft-graph-sync")
  thread.setDaemon(true)

  def start(): Unit = thread.start()
  def stop(): Unit = { stopped = true }
}
