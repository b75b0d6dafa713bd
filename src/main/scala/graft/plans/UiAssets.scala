package graft.plans

import com.sun.net.httpserver.{HttpExchange, HttpHandler}

/** The operator console's embedded assets — the counterpart of the
  * reference control plane's `rust_embed` asset fallback
  * (`control_plane/src/http/api/assets.rs:13-32`: serve the file when the
  * path matches an embedded asset, else fall back to `index.html` so the
  * SPA router owns unknown paths). Assets live on the classpath under
  * `graft/ui/` (`src/main/resources` — baked into the jar exactly like
  * the reference bakes `ui/dist` into its binary); the console itself is
  * a single vanilla-JS page (`graft/ui/index.html`) covering the
  * reference UI's screens (login, workspaces + spec editor with a DAG
  * view, daemons, daemon tokens — `ui/src/components/routing.rs:10-31`).
  *
  * Mounted at the ROOT context only when a [[ControlPlane]] is attached:
  * JDK `HttpServer` dispatches by longest matching context prefix, so
  * `/pipelines`, `/specs`, `/workspaces`, `/daemon` keep their handlers
  * and `/` picks up everything else — the same precedence axum gives
  * `.fallback(assets)` after the API routes.
  */
object UiAssets {

  private val Prefix = "graft/ui/"

  /** Bytes of one embedded asset, by path relative to the UI root
    * (`"index.html"`); `..` is rejected so a request can never walk out
    * of the asset namespace. */
  def asset(path: String): Option[Array[Byte]] = {
    if (path.contains("..")) return scala.None
    val in = getClass.getClassLoader.getResourceAsStream(Prefix + path)
    if (in == null) scala.None
    else {
      try Some(in.readAllBytes()) finally in.close()
    }
  }

  private def contentType(path: String): String = {
    val ext = path.substring(path.lastIndexOf('.') + 1).toLowerCase
    ext match {
      case "html" => "text/html; charset=utf-8"
      case "js"   => "text/javascript; charset=utf-8"
      case "css"  => "text/css; charset=utf-8"
      case "svg"  => "image/svg+xml"
      case "png"  => "image/png"
      case "json" => "application/json"
      case "md"   => "text/markdown; charset=utf-8"
      case _      => "application/octet-stream"
    }
  }

  /** The fallback handler: `/` → `index.html`, a matching asset → its
    * bytes, anything else → `index.html` (the SPA fallback the reference
    * ships — its `assets.rs` FIXME comment documents the same choice). */
  val handler: HttpHandler = new HttpHandler {
    override def handle(ex: HttpExchange): Unit = try {
      if (ex.getRequestMethod != "GET" && ex.getRequestMethod != "HEAD") {
        val b = "method not allowed\n".getBytes("UTF-8")
        ex.sendResponseHeaders(405, b.length)
        ex.getResponseBody.write(b)
      } else {
        val raw = ex.getRequestURI.getPath.stripPrefix("/")
        val path = if (raw.isEmpty) "index.html" else raw
        val (body, ct) = asset(path) match {
          case Some(bytes) => (bytes, contentType(path))
          case scala.None =>
            (asset("index.html").getOrElse(Array.emptyByteArray),
              contentType("index.html"))
        }
        ex.getResponseHeaders.set("Content-Type", ct)
        if (ex.getRequestMethod == "HEAD") {
          ex.sendResponseHeaders(200, -1)
        } else {
          ex.sendResponseHeaders(200, if (body.isEmpty) -1 else body.length.toLong)
          if (body.nonEmpty) ex.getResponseBody.write(body)
        }
      }
    } catch { case _: java.io.IOException => () } finally ex.close()
  }
}
