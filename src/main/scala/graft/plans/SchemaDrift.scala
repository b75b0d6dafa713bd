package graft.plans

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}

/** Schema-drift policy for long-running file-stream pipelines (SURVEY
  * §7.4.2): the reference tolerates per-chunk schema change by restarting
  * the task with the new shape. Structured Streaming fixes the schema per
  * query, so drift is handled at (re)compile time: the schema the query ran
  * with is recorded as a JSON sidecar next to the checkpoint, and each
  * compile compares the fresh probe against it.
  *
  *  - `widen` (default): adding columns is accepted — the query restarts
  *    with the union schema (removed columns stay, nullable, so downstream
  *    consumers keep their shape); processed files are not replayed
  *    (checkpoint keeps offsets). A TYPE change for an existing column is
  *    never widenable for an in-flight stream and fails regardless.
  *  - `fail`: any drift raises, for pipelines where shape is a contract.
  */
object SchemaDrift {

  val RecordFile = "_graft_schema.json"

  def resolve(spark: SparkSession, probe: StructType,
              recordPath: Option[String], policy: String): StructType =
    recordPath match {
      case None => probe // no record location: run with the probe as-is
      case Some(base) =>
        val p = Paths.get(base, RecordFile)
        val prev =
          if (Files.exists(p))
            Some(DataType.fromJson(Files.readString(p)).asInstanceOf[StructType])
          else None
        val resolved = prev match {
          case Some(old) if old != probe =>
            policy match {
              case "fail" => throw new IllegalStateException(
                s"schema drift: recorded ${old.simpleString} vs observed " +
                s"${probe.simpleString} (on_schema_drift=fail)")
              case _ =>
                val merged = widen(old, probe)
                System.err.println(s"[schema-drift] source schema changed, " +
                  s"widening: ${old.simpleString} -> ${merged.simpleString}")
                merged
            }
          case _ => probe
        }
        Files.createDirectories(p.getParent)
        // atomic tmp+rename, same contract as StateStore: a crash mid-write
        // must never leave a truncated record that poisons the next compile
        val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
        Files.writeString(tmp, resolved.json)
        Files.move(tmp, p, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        resolved
    }

  /** Union of columns; a same-name type change is not widenable. Probe
    * order first, then columns that disappeared from the files (kept so
    * downstream projections don't break; they read as null). */
  private[plans] def widen(old: StructType, probe: StructType): StructType = {
    val conflicts = old.fields.flatMap { f =>
      probe.find(_.name == f.name).filter(_.dataType != f.dataType)
        .map(g => s"${f.name}: ${f.dataType.simpleString} -> ${g.dataType.simpleString}")
    }
    if (conflicts.nonEmpty) throw new IllegalStateException(
      "schema drift changes column types (not widenable for a running " +
      "stream): " + conflicts.mkString(", "))
    val removed = old.fields.filterNot(f => probe.exists(_.name == f.name))
      .map(_.copy(nullable = true))
    StructType(probe.fields.map(_.copy(nullable = true)) ++ removed)
  }
}
