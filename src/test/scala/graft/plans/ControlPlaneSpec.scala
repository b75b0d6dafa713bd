package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}

/** Control-plane parity with the reference's operator API
  * (`control_plane/src/http/api/mod.rs:12-38`): daemon-token lifecycle
  * end-to-end (an ISSUED token authorizes spec pushes, a DELETED one
  * gets 401), the join flow (single-use token consumption, possession
  * hash, CSR signed against the CA keystore, replay rejected), and
  * workspaces grouping pipeline specs (create/read/delete; deleting the
  * workspace removes its member spec files). */
class ControlPlaneSpec extends AnyFunSuite {

  private val keytoolBin =
    java.nio.file.Paths.get(sys.props("java.home"), "bin", "keytool").toString
  private val pass = "changeit1"

  private def keytool(args: String*): Unit = {
    val pb = new ProcessBuilder((keytoolBin +: args): _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    assert(p.waitFor() == 0,
      s"keytool ${args.headOption.getOrElse("")} failed:\n$out")
  }

  private def http(method: String, url: String,
                   body: Option[String] = None,
                   auth: Option[String] = None): (Int, String) = {
    val c = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    c.setRequestMethod(method)
    auth.foreach(t => c.setRequestProperty("Authorization", s"Bearer $t"))
    body.foreach { b =>
      c.setDoOutput(true)
      val os = c.getOutputStream
      try os.write(b.getBytes("UTF-8")) finally os.close()
    }
    val code = c.getResponseCode
    val is = if (code < 400) c.getInputStream else c.getErrorStream
    val text = if (is == null) "" else new String(is.readAllBytes(), "UTF-8")
    (code, text)
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private val spec =
    """{"sections":[
      {"id":"src","name":"parquet_source","config":{"path":"/tmp/in"}},
      {"id":"sink","name":"parquet_destination","config":{"path":"/tmp/out"}}],
      "edges":[["src","sink"]]}"""

  private def newServer(specDir: Path, stateDir: Path,
                        ca: Option[ControlPlane.CaConfig] = scala.None)
      : (SpecPushServer, ControlPlane, String) = {
    val cp = new ControlPlane(stateDir, ca)
    val server = new SpecPushServer(specDir, port = 0,
      token = Some("admin-secret"), control = Some(cp))
    server.start()
    (server, cp, s"http://127.0.0.1:${server.boundPort}")
  }

  test("token lifecycle: issued token pushes, deleted token gets 401") {
    val specDir = Files.createTempDirectory("cp_specs")
    val (server, _, base) = newServer(specDir,
      Files.createTempDirectory("cp_state"))
    try {
      // no credential and wrong credential are rejected
      assert(http("POST", s"$base/specs/a", Some(spec))._1 == 401)
      assert(http("POST", s"$base/specs/a", Some(spec),
        auth = Some("nope"))._1 == 401)
      // admin mints a daemon token (admin-only route)
      assert(http("POST", s"$base/daemon/tokens", Some(""))._1 == 401)
      val (cc, cb) = http("POST", s"$base/daemon/tokens", Some(""),
        auth = Some("admin-secret"))
      assert(cc == 200)
      val tok = mapper.readTree(cb)
      val (id, secret) = (tok.path("id").asText(), tok.path("secret").asText())
      assert(secret.length == 32)
      // the ISSUED token authorizes a spec push
      assert(http("POST", s"$base/specs/a", Some(spec),
        auth = Some(secret))._1 == 200)
      assert(Files.exists(specDir.resolve("a.json")))
      // list shows it; delete revokes it
      val (_, lst) = http("GET", s"$base/daemon/tokens",
        auth = Some("admin-secret"))
      assert(lst.contains(id))
      assert(http("DELETE", s"$base/daemon/tokens/$id",
        auth = Some("admin-secret"))._1 == 200)
      // the DELETED token is 401 on the next push; admin still works
      assert(http("POST", s"$base/specs/b", Some(spec),
        auth = Some(secret))._1 == 401)
      assert(http("POST", s"$base/specs/b", Some(spec),
        auth = Some("admin-secret"))._1 == 200)
    } finally server.stop()
  }

  test("join: possession hash + single-use token + CA-chained certificate") {
    val dir = Files.createTempDirectory("cp_join")
    // CA identity and a daemon key pair + CSR, all via the JDK's keytool
    val caKs = dir.resolve("ca.p12")
    keytool("-genkeypair", "-alias", "ca", "-keyalg", "RSA", "-keysize",
      "2048", "-validity", "2", "-dname", "CN=graft-ca", "-ext", "bc:c",
      "-storetype", "PKCS12", "-keystore", caKs.toString, "-storepass", pass)
    val dKs = dir.resolve("daemon.p12")
    keytool("-genkeypair", "-alias", "d", "-keyalg", "RSA", "-keysize",
      "2048", "-validity", "2", "-dname", "CN=daemon-1",
      "-storetype", "PKCS12", "-keystore", dKs.toString, "-storepass", pass)
    val csrFile = dir.resolve("req.csr")
    keytool("-certreq", "-alias", "d", "-keystore", dKs.toString,
      "-storepass", pass, "-file", csrFile.toString)
    val csr = Files.readString(csrFile)

    val (server, cp, base) = newServer(Files.createTempDirectory("cp_specs2"),
      dir.resolve("state"),
      Some(ControlPlane.CaConfig(caKs, pass, "ca")))
    try {
      val t = cp.createToken()
      def hashOf(c: String, s: String): String =
        java.security.MessageDigest.getInstance("SHA-256")
          .digest((c + ":" + s).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      def joinBody(id: String, hash: String): String = {
        val n = mapper.createObjectNode()
        n.put("id", id); n.put("csr", csr); n.put("hash", hash)
        mapper.writeValueAsString(n)
      }
      // unknown token id → 404; wrong possession hash → 400
      assert(http("POST", s"$base/daemon/join",
        Some(joinBody("nope", hashOf(csr, t.secret))))._1 == 404)
      assert(http("POST", s"$base/daemon/join",
        Some(joinBody(t.id, hashOf(csr, "wrong"))))._1 == 400)
      // correct join → signed cert + CA cert, both verifiable
      val (jc, jb) = http("POST", s"$base/daemon/join",
        Some(joinBody(t.id, hashOf(csr, t.secret))))
      assert(jc == 200, jb)
      val resp = mapper.readTree(jb)
      val cf = java.security.cert.CertificateFactory.getInstance("X.509")
      def parse(pem: String) = cf.generateCertificate(
        new java.io.ByteArrayInputStream(pem.getBytes("UTF-8")))
        .asInstanceOf[java.security.cert.X509Certificate]
      val cert = parse(resp.path("certificate").asText())
      val caCert = parse(resp.path("ca_certificate").asText())
      assert(cert.getSubjectX500Principal.getName.contains("daemon-1"))
      cert.verify(caCert.getPublicKey) // chains to the CA trust anchor
      // the daemon is recorded; the token is CONSUMED — replay rejected
      assert(cp.listDaemons().exists(_.id == t.id))
      assert(cp.listTokens().find(_.id == t.id).exists(_.usedAt.isDefined))
      val (rc, rb) = http("POST", s"$base/daemon/join",
        Some(joinBody(t.id, hashOf(csr, t.secret))))
      assert(rc == 400 && rb.contains("token used"))
      // a consumed token still authorizes pushes (that is the credential
      // the joined daemon holds) until deleted
      assert(http("POST", s"$base/specs/c", Some(spec),
        auth = Some(t.secret))._1 == 200)
      // daemon set_name + delete round out the CRUD
      assert(http("POST", s"$base/daemon/set_name/${t.id}",
        Some("""{"name":"edge-7"}"""), auth = Some("admin-secret"))._1 == 200)
      assert(http("GET", s"$base/daemon")._2.contains("edge-7"))
      assert(http("DELETE", s"$base/daemon/${t.id}",
        auth = Some("admin-secret"))._1 == 200)
      assert(cp.listDaemons().isEmpty)
    } finally server.stop()
  }

  test("state survives a control-plane restart (atomic JSON files)") {
    val state = Files.createTempDirectory("cp_durable")
    val a = new ControlPlane(state)
    val t = a.createToken()
    a.createWorkspace("prod")
    assert(a.setDaemonName(t.id, Some("x")) == false) // not joined yet
    // a NEW instance over the same dir sees everything (daemon watch
    // restarts must not forget issued credentials or workspace grouping)
    val b = new ControlPlane(state)
    assert(b.listTokens().map(_.id) == Seq(t.id))
    assert(b.bearerAuthorized(t.secret))
    assert(b.listWorkspaces() == Seq("prod"))
    assert(b.deleteToken(t.id))
    // and the deletion is visible to the ORIGINAL instance too — the
    // files are the single source of truth, no in-memory cache to rot
    assert(!a.bearerAuthorized(t.secret))
  }

  test("workspaces group specs; delete removes the members") {
    val specDir = Files.createTempDirectory("cp_specs3")
    val (server, cp, base) = newServer(specDir,
      Files.createTempDirectory("cp_state3"))
    try {
      assert(http("POST", s"$base/workspaces",
        Some("""{"name":"prod"}"""))._1 == 401) // admin-only
      assert(http("POST", s"$base/workspaces", Some("""{"name":"prod"}"""),
        auth = Some("admin-secret"))._1 == 200)
      assert(http("POST", s"$base/workspaces", Some("""{"name":"prod"}"""),
        auth = Some("admin-secret"))._1 == 409) // duplicate
      assert(http("POST", s"$base/workspaces", Some("""{"name":"a__b"}"""),
        auth = Some("admin-secret"))._1 == 400) // separator reserved
      assert(http("GET", s"$base/workspaces")._2.contains("prod"))
      // member spec lands under the workspace prefix in the watched dir
      assert(http("PUT", s"$base/workspaces/prod/specs/ingest", Some(spec),
        auth = Some("admin-secret"))._1 == 200)
      assert(Files.exists(specDir.resolve("prod__ingest.json")))
      assert(http("PUT", s"$base/workspaces/ghost/specs/x", Some(spec),
        auth = Some("admin-secret"))._1 == 404) // unknown workspace
      // the MEMBER name gets the same `__` screen as the workspace name:
      // `b__c` would land as `prod__b__c.json`, ambiguous under the
      // prefix-parse with nested-looking names
      assert(http("PUT", s"$base/workspaces/prod/specs/b__c", Some(spec),
        auth = Some("admin-secret"))._1 == 400)
      assert(!Files.exists(specDir.resolve("prod__b__c.json")))
      // workspace read returns its members, secrets redacted
      val (_, wb) = http("GET", s"$base/workspaces/prod")
      assert(wb.contains("\"ingest\"") && wb.contains("parquet_source"))
      // a workspace member is a REAL pipeline: the same watcher reconcile
      // loop as ungrouped specs starts it (prefix naming, one loop).
      // Drop the non-runnable placeholder first so the poll below starts
      // exactly the runnable member.
      assert(http("DELETE", s"$base/workspaces/prod/specs/ingest",
        auth = Some("admin-secret"))._1 == 200)
      val spark = graft.TestSpark.spark
      val tmp = Files.createTempDirectory("cp_ws_run").toString
      val runnable =
        s"""{"sections":[
          {"id":"src","name":"parquet_source","config":{"path":"${graft.TestSpark.sf}/region.parquet"}},
          {"id":"sink","name":"parquet_destination","config":{"path":"$tmp/out","truncate":"true"}}],
          "edges":[["src","sink"]]}"""
      assert(http("PUT", s"$base/workspaces/prod/specs/run1", Some(runnable),
        auth = Some("admin-secret"))._1 == 200)
      val orch = new Orchestrator(spark, restartBackoffMs = 10)
      val watcher = new SpecDirWatcher(orch, specDir)
      val (started, _, _) = watcher.poll()
      assert(started.contains(PipelineSpec.fromJson(runnable).specHash),
        "workspace member spec did not start on reconcile")
      assert(spark.read.parquet(s"$tmp/out").count() == 5)
      assert(http("DELETE", s"$base/workspaces/prod/specs/run1",
        auth = Some("admin-secret"))._1 == 200)
      watcher.poll() // stop it before the workspace-delete assertions
      // deleting the workspace removes the registry entry AND the files —
      // its pipelines stop on the watcher's next poll
      assert(http("DELETE", s"$base/workspaces/prod",
        auth = Some("admin-secret"))._1 == 200)
      assert(!Files.exists(specDir.resolve("prod__ingest.json")))
      assert(http("GET", s"$base/workspaces/prod")._1 == 404)
      assert(cp.listWorkspaces().isEmpty)
    } finally server.stop()
  }
}
