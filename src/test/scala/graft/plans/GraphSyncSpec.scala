package graft.plans

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.nio.charset.StandardCharsets.UTF_8

/** In-band graph delivery: a daemon with NO filesystem path to the spec
  * dir — only host:port — bootstraps the graph over the websocket
  * (`GetGraph` → `GetGraphResponse{graph}`, the reference daemon_api
  * exchange), runs the right pipelines, and reconciles on push. */
class GraphSyncSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def specJson(tmp: String, tag: String) =
    s"""{"sections":[
      {"id":"src","name":"parquet_source","config":{"path":"${TestSpark.sf}/region.parquet"}},
      {"id":"tag","name":"tagging","config":{"column":"tag","text":"$tag"}},
      {"id":"sink","name":"parquet_destination","config":{"path":"$tmp/out_$tag","truncate":"true"}}],
      "edges":[["src","tag"],["tag","sink"]]}"""

  test("graph codec: dir -> response -> map round-trips; non-spec files excluded") {
    val dir = Files.createTempDirectory("gs_codec")
    Files.writeString(dir.resolve("a.json"), """{"sections":[],"edges":[]}""")
    Files.writeString(dir.resolve("ws__m.json"), """{"sections":[],"edges":[]}""")
    Files.writeString(dir.resolve(".a.json.push"), "tmp")   // push temp
    Files.writeString(dir.resolve("notes.txt"), "not a spec")
    // an INVALID spec file must not brick the graph for every dir-less
    // daemon: it ships VERBATIM (string-embedded) and the daemon-side
    // watcher applies the same last-known-good policy as a filesystem
    // daemon
    Files.writeString(dir.resolve("broken.json"), "{not valid json")
    val resp = GraphSync.graphResponseJson(dir)
    assert(resp.contains("\"GetGraphResponse\""))
    val graph = GraphSync.parseGraphResponse(resp).get
    assert(graph.keySet == Set("a", "ws__m", "broken"), graph.keySet)
    assert(graph("broken") == "{not valid json", "specs must ship verbatim")
    assert(graph("a") == """{"sections":[],"edges":[]}""")
    // request forms: tagged JSON and the bare string both recognized;
    // the response and the Refetch notification are NOT requests
    assert(GraphSync.isGetGraph(GraphSync.getGraphRequest))
    assert(GraphSync.isGetGraph("GetGraph"))
    assert(!GraphSync.isGetGraph(resp))
    assert(!GraphSync.isGetGraph("RefetchGraph"))
    assert(GraphSync.parseGraphResponse("RefetchGraph").isEmpty)
  }

  test("materialize: atomic writes, stale specs deleted, unsafe names rejected") {
    val dir = Files.createTempDirectory("gs_mat")
    Files.writeString(dir.resolve("stale.json"), """{"sections":[],"edges":[]}""")
    GraphSync.materialize(dir,
      Map("keep" -> """{"sections":[],"edges":[]}"""))
    assert(Files.exists(dir.resolve("keep.json")))
    assert(!Files.exists(dir.resolve("stale.json")),
      "specs absent from the graph must be deleted (their pipelines stop)")
    intercept[IllegalArgumentException] {
      GraphSync.materialize(dir, Map("../evil" -> "{}"))
    }
    intercept[IllegalArgumentException] {
      GraphSync.materialize(dir, Map(".hidden" -> "{}"))
    }
    assert(Files.exists(dir.resolve("keep.json")), "rejection must not wipe")
  }

  test("dir-less daemon: bootstraps over the socket, runs the pipelines, " +
    "reconciles on push — no shared directory anywhere") {
    val tmp = Files.createTempDirectory("gs_e2e").toString
    // the CONTROL-PLANE side: spec dir + HTTP push + ws with the graph
    // provider (what `graft serve` composes)
    val specDir = Files.createTempDirectory("gs_e2e_specs")
    val ws = new SpecPushWs(
      graphProvider = Some(() => GraphSync.graphResponseJson(specDir)))
    ws.start()
    val server = new SpecPushServer(specDir, port = 0,
      onChange = Some(() => ws.broadcast(ws.RefetchGraph)))
    server.start()
    // the DAEMON side: its own private dir + its own orchestrator — the
    // only thing shared with the control plane is host:port
    val localDir = Files.createTempDirectory("gs_e2e_daemon")
    val orch = new Orchestrator(spark, restartBackoffMs = 10)
    val watcher = new SpecDirWatcher(orch, localDir)
    @volatile var polls = List.empty[(Set[String], Set[String], Set[String])]
    val daemon = new GraphSyncDaemon("127.0.0.1", ws.boundPort, localDir,
      onSync = () => polls +:= watcher.poll(), reconnectMs = 100)
    try {
      // spec exists BEFORE the daemon connects — the bootstrap case
      val a = specJson(tmp, "gs_a")
      Files.writeString(specDir.resolve("a.json"), a, UTF_8)
      daemon.start()
      val d1 = System.currentTimeMillis() + 15000
      while (daemon.syncCount < 1 && System.currentTimeMillis() < d1)
        Thread.sleep(50)
      assert(daemon.syncCount >= 1, "daemon never bootstrapped")
      assert(Files.readString(localDir.resolve("a.json"), UTF_8)
        .contains("\"tagging\""), "secret-real spec must materialize")
      def awaitRows(path: String): Unit = {
        val dl = System.currentTimeMillis() + 15000
        var ok = false
        while (!ok && System.currentTimeMillis() < dl) {
          ok = try spark.read.parquet(path).count() == 5
            catch { case _: Exception => false }
          if (!ok) Thread.sleep(100)
        }
        assert(ok, s"$path never produced the expected rows")
      }
      awaitRows(s"$tmp/out_gs_a")
      assert(polls.last._1 == Set(PipelineSpec.fromJson(a).specHash))
      // now a push lands on the CONTROL PLANE — RefetchGraph reaches the
      // daemon, it re-requests, materializes, reconciles: the new
      // pipeline runs, the removed one stops
      val b = specJson(tmp, "gs_b")
      val c = new java.net.URL(
        s"http://127.0.0.1:${server.boundPort}/specs/b").openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      c.setRequestMethod("POST"); c.setDoOutput(true)
      val os = c.getOutputStream
      try os.write(b.getBytes(UTF_8)) finally os.close()
      assert(c.getResponseCode == 200)
      val d2 = System.currentTimeMillis() + 15000
      while (daemon.syncCount < 2 && System.currentTimeMillis() < d2)
        Thread.sleep(50)
      assert(daemon.syncCount >= 2, "push never re-synced the daemon")
      awaitRows(s"$tmp/out_gs_b")
      assert(polls.head._1 == Set(PipelineSpec.fromJson(b).specHash))
      // deleting on the control plane stops the daemon's pipeline
      val del = new java.net.URL(
        s"http://127.0.0.1:${server.boundPort}/specs/a").openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      del.setRequestMethod("DELETE")
      assert(del.getResponseCode == 200)
      val d3 = System.currentTimeMillis() + 15000
      while (daemon.syncCount < 3 && System.currentTimeMillis() < d3)
        Thread.sleep(50)
      assert(!Files.exists(localDir.resolve("a.json")),
        "deleted spec must leave the daemon's dir")
      assert(polls.head._3 == Set(PipelineSpec.fromJson(a).specHash),
        "the removed spec's pipeline must STOP on the daemon")
    } finally { daemon.stop(); server.stop(); ws.stop() }
  }
}
