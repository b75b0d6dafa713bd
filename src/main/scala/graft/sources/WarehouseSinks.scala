package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Stage-and-COPY warehouse destinations (SURVEY §2.3 D4/D5).
  *
  * Both reference sinks are a SEQUENCE OF SQL STATEMENTS against the
  * warehouse, not a row protocol: snowflake stages a parquet artifact and
  * COPYs it in (`sections/snowflake/src/destination.rs:126-177`); redshift
  * is told which s3 objects to load and issues one COPY per path
  * (`sections/redshift_loader/src/destination.rs:80-101`). The statement
  * sequence is the contract, so it is factored behind [[SqlExec]]: in
  * production a JDBC connection to the warehouse, in tests a recorder —
  * the exact CREATE→PUT→COPY order is asserted without a warehouse, the
  * same pattern as MemJdbc for the row-protocol sinks.
  */
object WarehouseSinks {

  /** One warehouse SQL statement executor. */
  trait SqlExec { def exec(sql: String): Unit }

  /** Production executor: every exec runs on ONE lazily-opened connection,
    * because the statement sequences are SESSION-SCOPED — snowflake's
    * `CREATE OR REPLACE TEMPORARY FILE FORMAT` is visible only to the
    * session that created it, so the COPY referencing it must share that
    * session (the reference likewise issues the whole sequence on one
    * SnowflakeApi session, `destination.rs:126-177`). Autocommit stays on:
    * each statement commits individually, as in the reference. Close after
    * the load. */
  final class JdbcExec(url: String) extends SqlExec with AutoCloseable {
    private var conn: java.sql.Connection = _
    private def connection(): java.sql.Connection = {
      if (conn == null || conn.isClosed) conn = java.sql.DriverManager.getConnection(url)
      conn
    }
    // fully synchronized: the one shared connection means two concurrent
    // exec()s would otherwise interleave statements mid-sequence
    override def exec(sql: String): Unit = synchronized {
      val st = connection().createStatement()
      try { st.execute(sql); () } finally st.close()
    }
    override def close(): Unit = synchronized {
      if (conn != null && !conn.isClosed) conn.close()
    }
  }

  /** The reference's arrow→snowflake column type mapping
    * (`destination.rs:180-208`), re-keyed by Spark types. Unmappable types
    * throw — the Spark-typed equivalent of the reference rejecting
    * `DataType::Any` columns up front (Spark frames are always concretely
    * typed, so the reachable parity is rejecting types snowflake can't
    * load). */
  def snowflakeType(dt: DataType): String = dt match {
    case BooleanType => "BOOLEAN"
    case NullType | ByteType | ShortType | IntegerType | LongType => "NUMBER"
    case FloatType | DoubleType => "Float" // the reference's exact spelling
    case d: DecimalType => s"NUMBER(${38 - d.scale}, ${d.scale})"
    case DateType => "DATE"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case BinaryType => "BINARY"
    case StringType => "VARCHAR"
    case _: CharType | _: VarcharType => "VARCHAR"
    case CalendarIntervalType | _: ArrayType => "ARRAY"
    case _: StructType | _: MapType => "OBJECT"
    case other => throw new IllegalArgumentException(
      s"snowflake destination can't handle column type $other")
  }

  /** The reference's table-name substitution (`destination.rs:146`). */
  def tableNameOf(origin: String): String =
    origin.map(c => if (c == ' ' || c == '/' || c == ':' || c == '.') '_' else c)

  private val SnowflakeFileFormat =
    "CREATE OR REPLACE TEMPORARY FILE FORMAT CUSTOM_PARQUET_FORMAT " +
    "TYPE = PARQUET COMPRESSION = AUTO TRIM_SPACE = TRUE " +
    "REPLACE_INVALID_CHARACTERS = TRUE BINARY_AS_TEXT = FALSE " +
    "USE_LOGICAL_TYPE = TRUE;"

  /** D4 snowflake destructive load (`destination.rs:126-177`), one load
    * per origin: stage the origin's slice as parquet under
    * `stageDir/<table>`, then CREATE TABLE IF NOT EXISTS → PUT → file
    * format → optional TRUNCATE → COPY INTO ... MATCH_BY_COLUMN_NAME =
    * CASE_INSENSITIVE PURGE = TRUE.
    *
    * Scale: the slice keeps its partitioning — every executor writes its
    * parts in parallel and ONE PUT globs the directory (the reference
    * single-threads a single temp file per batch; a glob PUT is the same
    * statement contract without the single-writer bottleneck). Frame must
    * carry an `origin` column (the reference keys tables by message
    * origin).
    *
    * STAGE LOCALITY: internal-stage mode (`externalStage = None`) issues
    * `PUT file://` — the staged files must be readable from the host
    * running the JDBC session, so `stageDir` must be a DRIVER-LOCAL path
    * (fine for the reference's single-daemon model; on a cluster the
    * executors' parts must land on a filesystem the driver also sees).
    * The cluster-scale path is `externalStage = Some(stageName)`: point
    * `stageDir` at the object-store location an external stage (`CREATE
    * STAGE <stageName> URL='s3://…'`) is defined over; executors write
    * parquet straight to it (the existing s3a sink path) and the COPY
    * reads `@<stageName>/<table>/` — no PUT, no driver-locality
    * assumption, no single-host staging bottleneck. */
  def snowflake(df: DataFrame, api: SqlExec, stageDir: String,
                truncate: Boolean = false,
                externalStage: Option[String] = None): Unit = {
    // reject unmappable columns BEFORE any staging happens, like the
    // reference's per-chunk Any check
    df.schema.fields.filterNot(_.name == "origin")
      .foreach(f => snowflakeType(f.dataType))
    Sinks.routeByOrigin(df) { (origin, slice) =>
      val table = tableNameOf(origin)
      val ddl = slice.schema.fields
        .map(f => s"${f.name} ${snowflakeType(f.dataType)}").mkString(", ")
      val dir = s"$stageDir/$table"
      slice.write.mode("overwrite").parquet(dir)
      api.exec(s"CREATE TABLE IF NOT EXISTS $table($ddl);")
      externalStage match {
        case None =>
          api.exec(s"PUT file://$dir/*.parquet @%$table;")
          api.exec(SnowflakeFileFormat)
          if (truncate) api.exec(s"TRUNCATE TABLE $table;")
          api.exec(s"COPY INTO $table FILE_FORMAT = CUSTOM_PARQUET_FORMAT " +
            "PURGE = TRUE MATCH_BY_COLUMN_NAME = CASE_INSENSITIVE;")
        case Some(stage) =>
          api.exec(SnowflakeFileFormat)
          if (truncate) api.exec(s"TRUNCATE TABLE $table;")
          api.exec(s"COPY INTO $table FROM @$stage/$table/ " +
            "FILE_FORMAT = CUSTOM_PARQUET_FORMAT PURGE = TRUE " +
            "PATTERN = '.*[.]parquet' " +
            "MATCH_BY_COLUMN_NAME = CASE_INSENSITIVE;")
      }
    }
  }

  private def sqlQuote(s: String, q: Char): String =
    s.replace(q.toString, s"$q$q")

  /** D5 redshift loader (`destination.rs:41-107`): the input frame CARRIES
    * LOAD PATHS, not data — column `path` holds s3 objects already written
    * by an upstream s3 sink; per origin, one `COPY "<origin>" FROM
    * '<path>' iam_role ... region ... <format>` per path row, in frame
    * order. Paths are O(#staged files) — a driver-side loop is the right
    * shape (the warehouse does the heavy lifting). */
  def redshiftLoad(df: DataFrame, api: SqlExec, iamRole: String,
                   region: String, dataFormat: String = "CSV",
                   ignoreHeader: Boolean = false): Unit = {
    // the reference supports CSV only (`destination.rs:59-62`); PARQUET is
    // our extension using redshift's actual COPY syntax for it — the
    // format an s3 parquet lake sink upstream actually produces
    val fmt = dataFormat.toUpperCase match {
      case "CSV" => "CSV"
      case "PARQUET" => "FORMAT AS PARQUET"
      case other => throw new IllegalArgumentException(
        s"unsupported data format: $other")
    }
    require(df.columns.contains("path"),
      "expected to have field 'path' with s3 objects paths in dataframe")
    Sinks.routeByOrigin(df) { (origin, slice) =>
      slice.select("path").collect().foreach { row =>
        val path = row.getString(0)
        val stmt = (s"""COPY "${sqlQuote(origin, '"')}" """ +
          s"FROM '${sqlQuote(path, '\'')}' " +
          s"iam_role '${sqlQuote(iamRole, '\'')}' " +
          s"region '${sqlQuote(region, '\'')}' $fmt " +
          (if (ignoreHeader) "IGNOREHEADER 1" else "")).trim
        api.exec(stmt)
      }
    }
  }
}
