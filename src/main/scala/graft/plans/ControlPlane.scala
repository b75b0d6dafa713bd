package graft.plans

import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Operator-facing control-plane state: daemon tokens, joined daemons,
  * and workspaces — the analog of the reference control plane's API
  * surface (`control_plane/src/http/api/mod.rs:12-38`: workspaces
  * create/read/delete, daemon join, token issue/list/delete, daemon
  * list/delete/set_name). The reference backs this with a SQL store and
  * a PKI CA; here the store is the same atomic tmp+rename JSON-file
  * discipline as [[StateStore]] (crash yields the previous state, never
  * a torn file) and the CA is the JDK keystore already serving
  * [[TlsConfig]] mTLS — CSR signing shells out to the JDK's own
  * `keytool -gencert`, so a joined daemon's certificate chains to the
  * exact trust anchor the mTLS listener verifies against.
  *
  * Token semantics mirror the reference
  * (`control_plane/src/app/mod.rs:505-563`):
  *  - `createToken` issues {id, secret(hex-128), issued_at, used_at=None};
  *  - `join` CONSUMES a token: it must exist and be unused ("token used"
  *    on replay), and the request must prove possession of the secret
  *    WITHOUT sending it — `hash = sha256(csr + ":" + secret)` — so the
  *    secret never crosses the wire at join time;
  *  - a consumed token keeps AUTHORIZING bearer pushes (that is what the
  *    daemon holds) until explicitly deleted — delete is revocation, the
  *    next push answers 401.
  */
object ControlPlane {
  final case class DaemonToken(id: String, secret: String, issuedAt: Long,
                               usedAt: Option[Long])
  final case class DaemonRec(id: String, name: Option[String], joinedAt: Long,
                             lastSeen: Option[Long] = scala.None)

  /** CA identity for signing join CSRs: a PKCS#12 keystore holding the
    * CA key pair under `alias` — typically the same store whose cert
    * sits in the mTLS listener's truststore. */
  final case class CaConfig(keystore: Path, storepass: String, alias: String)
}

final class ControlPlane(stateDir: Path,
                         ca: Option[ControlPlane.CaConfig] = scala.None,
                         now: () => Long = () => System.currentTimeMillis()) {
  import ControlPlane._
  Files.createDirectories(stateDir)
  private val mapper = new ObjectMapper()
  private val tokensFile = stateDir.resolve("daemon_tokens.json")
  private val daemonsFile = stateDir.resolve("daemons.json")
  private val rng = new java.security.SecureRandom()

  // ---- durable maps (atomic tmp+rename, read-on-demand: the files are
  // operator-scale — tens of rows — so re-reading beats cache coherence
  // machinery, and every mutation is one atomic rename) ----

  private def writeAtomic(p: Path, body: String): Unit = {
    val tmp = p.resolveSibling(s".${p.getFileName}.tmp")
    Files.writeString(tmp, body, UTF_8)
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def readTokens(): Seq[DaemonToken] =
    if (!Files.exists(tokensFile)) Seq.empty
    else mapper.readTree(Files.readString(tokensFile, UTF_8))
      .elements().asScala.map { n =>
        DaemonToken(n.path("id").asText(), n.path("secret").asText(),
          n.path("issued_at").asLong(),
          if (n.has("used_at")) Some(n.path("used_at").asLong()) else scala.None)
      }.toSeq

  private def writeTokens(ts: Seq[DaemonToken]): Unit = {
    val root = mapper.createArrayNode()
    ts.foreach { t =>
      val n = root.addObject()
      n.put("id", t.id); n.put("secret", t.secret)
      n.put("issued_at", t.issuedAt)
      t.usedAt.foreach(n.put("used_at", _))
    }
    writeAtomic(tokensFile, mapper.writeValueAsString(root))
  }

  private def readDaemons(): Seq[DaemonRec] =
    if (!Files.exists(daemonsFile)) Seq.empty
    else mapper.readTree(Files.readString(daemonsFile, UTF_8))
      .elements().asScala.map { n =>
        DaemonRec(n.path("id").asText(),
          if (n.has("name")) Some(n.path("name").asText()) else scala.None,
          n.path("joined_at").asLong(),
          if (n.has("last_seen")) Some(n.path("last_seen").asLong())
          else scala.None)
      }.toSeq

  private def writeDaemons(ds: Seq[DaemonRec]): Unit = {
    val root = mapper.createArrayNode()
    ds.foreach { d =>
      val n = root.addObject()
      n.put("id", d.id); d.name.foreach(n.put("name", _))
      n.put("joined_at", d.joinedAt)
      d.lastSeen.foreach(n.put("last_seen", _))
    }
    writeAtomic(daemonsFile, mapper.writeValueAsString(root))
  }

  // ---- token lifecycle ----

  def createToken(): DaemonToken = synchronized {
    val secret = Array.fill(16)(f"${rng.nextInt(256)}%02x").mkString
    val t = DaemonToken(java.util.UUID.randomUUID().toString, secret,
      now(), scala.None)
    writeTokens(readTokens() :+ t)
    t
  }

  def listTokens(): Seq[DaemonToken] = synchronized { readTokens() }

  def deleteToken(id: String): Boolean = synchronized {
    val ts = readTokens()
    val kept = ts.filterNot(_.id == id)
    if (kept.size == ts.size) false else { writeTokens(kept); true }
  }

  /** Bearer authorization for spec mutations: ANY still-present token's
    * secret authorizes (deleted = revoked). Constant-time per candidate —
    * comparison timing must not leak secret prefixes. */
  def bearerAuthorized(presented: String): Boolean = synchronized {
    val p = presented.getBytes(UTF_8)
    readTokens().exists(t =>
      java.security.MessageDigest.isEqual(p, t.secret.getBytes(UTF_8)))
  }

  // ---- join ----

  private def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(UTF_8)).map("%02x".format(_)).mkString

  /** Daemon join (`control_plane/src/app/mod.rs:531-563`): consume the
    * token, verify `hash == sha256(csr + ":" + secret)`, sign the CSR
    * against the CA keystore, record the daemon.
    * @return Left((httpStatus, error)) or Right((certPem, caCertPem)) */
  def join(tokenId: String, csrPem: String,
           hashHex: String): Either[(Int, String), (String, String)] =
    synchronized {
      val ts = readTokens()
      ts.find(_.id == tokenId) match {
        case scala.None => Left((404, "token not found"))
        case Some(t) if t.usedAt.isDefined => Left((400, "token used"))
        case Some(t) =>
          // constant-time like bearerAuthorized/adminAuthorized: a plain
          // String != would let a holder of an unused token id probe the
          // expected hex byte-by-byte via timing
          if (!java.security.MessageDigest.isEqual(
              sha256Hex(csrPem + ":" + t.secret).getBytes(UTF_8),
              hashHex.getBytes(UTF_8)))
            Left((400, "hash mismatch"))
          else ca match {
            case scala.None => Left((500, "no CA configured"))
            case Some(c) =>
              try {
                val (cert, caCert) = signCsr(c, csrPem)
                writeTokens(ts.map(x =>
                  if (x.id == tokenId) x.copy(usedAt = Some(now())) else x))
                writeDaemons(readDaemons()
                  .filterNot(_.id == tokenId) :+
                  DaemonRec(tokenId, scala.None, now()))
                Right((cert, caCert))
              } catch { case e: Exception =>
                Left((500, s"csr signing failed: ${e.getMessage}"))
              }
          }
      }
    }

  /** Sign a PEM CSR with the CA keystore via the JDK's `keytool -gencert`
    * (no new dependencies; the issued cert chains to the mTLS trust
    * anchor). Returns (signed cert PEM, CA cert PEM). */
  private def signCsr(c: CaConfig, csrPem: String): (String, String) = {
    val keytool = java.nio.file.Paths
      .get(sys.props("java.home"), "bin", "keytool").toString
    val work = Files.createTempDirectory("graft_join")
    try {
      val csr = work.resolve("req.csr")
      val out = work.resolve("cert.pem")
      Files.writeString(csr, csrPem, UTF_8)
      def run(args: String*): String = {
        val pb = new ProcessBuilder((keytool +: args): _*)
        // the store password rides the child ENVIRONMENT
        // (-storepass:env), never the argv — a command line is visible
        // to every local process for the life of the child
        pb.environment().put("GRAFT_CA_PASS", c.storepass)
        pb.redirectErrorStream(true)
        val p = pb.start()
        val log = new String(p.getInputStream.readAllBytes(), UTF_8)
        require(p.waitFor() == 0, s"keytool failed: ${log.take(500)}")
        log
      }
      run("-gencert", "-keystore", c.keystore.toString,
        "-storepass:env", "GRAFT_CA_PASS", "-alias", c.alias,
        "-infile", csr.toString,
        "-outfile", out.toString, "-rfc", "-validity", "365")
      val caOut = work.resolve("ca.pem")
      run("-exportcert", "-keystore", c.keystore.toString,
        "-storepass:env", "GRAFT_CA_PASS", "-alias", c.alias,
        "-rfc", "-file", caOut.toString)
      (Files.readString(out, UTF_8), Files.readString(caOut, UTF_8))
    } finally {
      Files.list(work).iterator().asScala.foreach(Files.deleteIfExists(_))
      Files.deleteIfExists(work)
      ()
    }
  }

  // ---- workspaces (create/read/delete —
  // `control_plane/src/http/api/workspaces.rs`) ----
  // A workspace is a NAMED GROUP of pipeline specs. The grouping itself
  // lives here (registry file); the member specs live in the watched spec
  // dir under the `<workspace>__<spec>.json` naming convention, so
  // workspace members flow through exactly the same SpecDirWatcher
  // reconcile loop as ungrouped specs (see SpecPushServer's
  // /workspaces routes, which enforce the convention).

  private val workspacesFile = stateDir.resolve("workspaces.json")

  def listWorkspaces(): Seq[String] = synchronized {
    if (!Files.exists(workspacesFile)) Seq.empty
    else mapper.readTree(Files.readString(workspacesFile, UTF_8))
      .elements().asScala.map(_.asText()).toSeq
  }

  def createWorkspace(name: String): Boolean = synchronized {
    val ws = listWorkspaces()
    if (ws.contains(name)) false
    else {
      val root = mapper.createArrayNode()
      (ws :+ name).sorted.foreach(root.add)
      writeAtomic(workspacesFile, mapper.writeValueAsString(root))
      true
    }
  }

  def deleteWorkspace(name: String): Boolean = synchronized {
    val ws = listWorkspaces()
    if (!ws.contains(name)) false
    else {
      val root = mapper.createArrayNode()
      ws.filterNot(_ == name).foreach(root.add)
      writeAtomic(workspacesFile, mapper.writeValueAsString(root))
      true
    }
  }

  // ---- daemons ----

  def listDaemons(): Seq[DaemonRec] = synchronized { readDaemons() }

  def deleteDaemon(id: String): Boolean = synchronized {
    val ds = readDaemons()
    val kept = ds.filterNot(_.id == id)
    if (kept.size == ds.size) false else { writeDaemons(kept); true }
  }

  def setDaemonName(id: String, name: Option[String]): Boolean = synchronized {
    val ds = readDaemons()
    if (!ds.exists(_.id == id)) false
    else { writeDaemons(ds.map(d => if (d.id == id) d.copy(name = name) else d)); true }
  }

  def hasDaemon(id: String): Boolean = synchronized {
    readDaemons().exists(_.id == id)
  }

  /** Stamp a daemon's `last_seen` — the reference sets it when the
    * daemon's socket closes (`daemon_set_last_seen`,
    * `control_plane/src/app/mod.rs:579-582`). */
  def setDaemonLastSeen(id: String, ts: Long): Boolean = synchronized {
    val ds = readDaemons()
    if (!ds.exists(_.id == id)) false
    else {
      writeDaemons(ds.map(d =>
        if (d.id == id) d.copy(lastSeen = Some(ts)) else d))
      true
    }
  }
}
