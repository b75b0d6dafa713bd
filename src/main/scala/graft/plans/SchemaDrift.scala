package graft.plans

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
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
  *
  * The sidecar goes through the checkpoint's Hadoop [[FileSystem]] (local,
  * hdfs://, s3a://, ...) so it genuinely lives NEXT TO the checkpoint —
  * a driver-local java.nio write would reset the record on every new
  * driver host. Written tmp-then-rename; a crash between delete and
  * rename at worst loses the record (next compile re-records the probe),
  * never leaves a truncated one.
  */
object SchemaDrift {

  val RecordFile = "_graft_schema.json"

  def resolve(spark: SparkSession, probe: StructType,
              recordPath: Option[String], policy: String): StructType = {
    require(policy == "widen" || policy == "fail",
      s"on_schema_drift must be widen|fail, got '$policy'")
    recordPath match {
      case None => probe // no record location: run with the probe as-is
      case Some(base) =>
        val p = new HPath(base, RecordFile)
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        val prev =
          if (fs.exists(p)) {
            val in = fs.open(p)
            try Some(DataType.fromJson(new String(in.readAllBytes(), "UTF-8"))
              .asInstanceOf[StructType])
            finally in.close()
          } else None
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
        val tmp = new HPath(base, RecordFile + ".tmp")
        val out = fs.create(tmp, true)
        try out.write(resolved.json.getBytes("UTF-8")) finally out.close()
        if (fs.exists(p)) fs.delete(p, false)
        fs.rename(tmp, p)
        resolved
    }
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
