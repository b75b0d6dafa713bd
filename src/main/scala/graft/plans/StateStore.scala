package graft.plans

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Per-section durable KV state — the counterpart of the daemon's SQLite
  * `state` table (mycelial `myceliald/src/sqlite_storage.rs:142-196`,
  * migration `20230806170305_state.sql`).
  *
  * State is tiny by design (a watermark, a cursor — single values per
  * section, SURVEY §7.4.4), so it lives as one JSON file per
  * (pipeline, section) under a state dir, written atomically
  * (tmp + ATOMIC_MOVE) strictly AFTER the sink commit — preserving the
  * reference's ack-after-commit at-least-once contract
  * (`section/src/command_channel.rs:68-80`). On a cluster the same code
  * targets a shared filesystem; volume is O(#pipelines), never O(data).
  */
final class StateStore(root: String) {

  private def fileFor(pipeline: String, section: String): Path =
    Paths.get(root, pipeline, s"$section.json")

  def get(pipeline: String, section: String, key: String): Option[String] =
    load(pipeline, section).get(key)

  def getLong(pipeline: String, section: String, key: String): Option[Long] =
    get(pipeline, section, key).map(_.toLong)

  def set(pipeline: String, section: String, kv: (String, String)*): Unit = {
    val merged = load(pipeline, section) ++ kv
    val f = fileFor(pipeline, section)
    Files.createDirectories(f.getParent)
    val json = merged.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${quote(k)}:${quote(v)}" }
      .mkString("{", ",", "}")
    val tmp = f.resolveSibling(f.getFileName.toString + ".tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, f, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Reference semantics: state is dropped when a section's identity
    * changes (`sections/dir/src/source.rs:223-224` resets on path change). */
  def delete(pipeline: String, section: String): Unit =
    Files.deleteIfExists(fileFor(pipeline, section))

  def load(pipeline: String, section: String): Map[String, String] = {
    val f = fileFor(pipeline, section)
    if (!Files.exists(f)) Map.empty
    else parse(new String(Files.readAllBytes(f), StandardCharsets.UTF_8))
  }

  def pipelines(): Seq[String] = {
    val r = Paths.get(root)
    if (!Files.exists(r)) Nil
    else Files.list(r).iterator().asScala.filter(Files.isDirectory(_))
      .map(_.getFileName.toString).toSeq.sorted
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  // Minimal flat {"k":"v"} parser — the only shape we ever write.
  private def parse(json: String): Map[String, String] = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    m.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
  }
}
