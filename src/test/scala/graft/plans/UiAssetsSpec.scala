package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The operator console rides the control plane's asset fallback exactly
  * like the reference embeds its UI (`assets.rs`): `/` serves the page,
  * unknown paths fall back to it (the SPA router owns them), and the
  * API contexts keep winning the dispatch — longest-prefix routing means
  * mounting the console can never shadow a route. */
class UiAssetsSpec extends AnyFunSuite {

  private def http(method: String, url: String): (Int, String, String) = {
    val c = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    c.setRequestMethod(method)
    val code = c.getResponseCode
    val ct = Option(c.getHeaderField("Content-Type")).getOrElse("")
    val is = if (code < 400) c.getInputStream else c.getErrorStream
    val text = if (is == null) "" else new String(is.readAllBytes(), "UTF-8")
    (code, ct, text)
  }

  test("console served at root with SPA fallback; API routes unshadowed") {
    val specDir = Files.createTempDirectory("ui_specs")
    val cp = new ControlPlane(Files.createTempDirectory("ui_state"))
    val server = new SpecPushServer(specDir, port = 0,
      token = Some("admin-secret"), control = Some(cp))
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.boundPort}"

      val (c1, ct1, b1) = http("GET", s"$base/")
      assert(c1 == 200 && ct1.startsWith("text/html"))
      assert(b1.contains("graft console"))

      // unknown path → index.html (the reference's assets.rs fallback)
      val (c2, ct2, b2) = http("GET", s"$base/some/spa/route")
      assert(c2 == 200 && ct2.startsWith("text/html") && b2 == b1)

      // direct asset fetch by name
      val (c3, _, b3) = http("GET", s"$base/index.html")
      assert(c3 == 200 && b3 == b1)

      // API contexts still win the dispatch over the root fallback
      val (c4, _, b4) = http("GET", s"$base/workspaces")
      assert(c4 == 200 && b4.trim.startsWith("["))
      val (c5, _, b5) = http("GET", s"$base/specs")
      assert(c5 == 200 && b5.trim.startsWith("["))

      // the UI is a read surface — mutations through it don't exist
      assert(http("POST", s"$base/")._1 == 405)

      // the pipelines view renders the /pipelines `error` field behind
      // a row expander (failed rows expand to the cause chain)
      assert(b1.contains("p.error") && b1.contains("errd-") &&
        b1.contains("errpre"), "console lost the failure-detail expander")
    } finally server.stop()
  }

  test("section palette: GET /sections lists the registry with IO kinds") {
    val specDir = Files.createTempDirectory("ui_specs2")
    val cp = new ControlPlane(Files.createTempDirectory("ui_state2"))
    val server = new SpecPushServer(specDir, port = 0, control = Some(cp))
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.boundPort}"
      val (code, _, body) = http("GET", s"$base/sections")
      assert(code == 200)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val arr = mapper.readTree(body)
      assert(arr.isArray && arr.size() == SectionRegistry.entries.size)
      val byName = arr.elements()
      var found = false
      while (byName.hasNext) {
        val n = byName.next()
        if (n.path("name").asText() == "parquet_source") {
          found = true
          assert(n.path("input").asText() == "none")
          assert(n.path("output").asText() == "dataframe")
        }
      }
      assert(found)
    } finally server.stop()
  }

  test("daemon-facing server (no control plane) has no console") {
    val specDir = Files.createTempDirectory("ui_specs3")
    val server = new SpecPushServer(specDir, port = 0)
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.boundPort}"
      assert(http("GET", s"$base/")._1 == 404)
      assert(http("GET", s"$base/sections")._1 == 404)
    } finally server.stop()
  }
}
