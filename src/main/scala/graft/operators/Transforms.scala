package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** In-flight transforms — the Spark-native re-expression of the reference's
  * section transforms (SURVEY.md §2.2). Each is a pure
  * `DataFrame => DataFrame`, so a pipeline chain of them fuses into a single
  * WholeStageCodegen stage: no materialization between sections, matching
  * (and at scale beating) the reference's lazy message-wrapping
  * (mycelial `sections/typecast_transformer/src/lib.rs:148-172`).
  *
  * The `origin` convention: tabular payloads may carry a metadata column
  * `origin: string` naming the logical source table/file
  * (mycelial `section/src/message.rs:522`). Binary payloads are
  * `(origin: string, value: binary)`.
  */
object Transforms {

  val OriginCol = "origin"

  /** T1 typecast_transformer (`sections/typecast_transformer/src/lib.rs:119-146`):
    * cast one column or `*` = every column to a target type.
    * Types follow the reference surface: "int" → long, "real" → double,
    * "string" → string. Widening-only failure semantics come from Spark ANSI
    * mode (set `spark.sql.ansi.enabled=true` for error-on-lossy parity). */
  def typecast(column: String, target: String)(df: DataFrame): DataFrame = {
    val to: DataType = target match {
      case "int"    => LongType
      case "real"   => DoubleType
      case "string" => StringType
      case other    => throw new IllegalArgumentException(
        s"typecast target must be int|real|string, got $other")
    }
    if (column == "*")
      df.select(df.columns.map(c => col(c).cast(to).as(c)).toIndexedSeq: _*)
    else df.withColumn(column, col(column).cast(to))
  }

  /** T2 tagging_transformer (`sections/tagging_transformer/src/lib.rs:12-78`):
    * append a constant string column; skip if the name already exists
    * (reference skips on collision). */
  def tagging(column: String, text: String)(df: DataFrame): DataFrame =
    if (df.columns.contains(column)) df
    else df.withColumn(column, lit(text))

  /** T3 origin_transform/regex (`sections/origin_transform/src/regex.rs:15-68`):
    * rewrite the origin column by regex replace-all. */
  def originRegex(pattern: String, replacement: String)(df: DataFrame): DataFrame =
    df.withColumn(OriginCol, regexp_replace(col(OriginCol), pattern, replacement))

  /** T4 origin_transform/time_nanos (`sections/origin_transform/src/time_nanos.rs:18-72`):
    * replace regex matches in origin with a per-batch epoch-nanos stamp
    * (unique-name generator for file sinks). Computed once on the driver so
    * every row of the batch gets the same stamp — the reference stamps once
    * per message. */
  def originTimeNanos(pattern: String)(df: DataFrame): DataFrame = {
    val nanos = System.currentTimeMillis() * 1000000L
    df.withColumn(OriginCol,
      regexp_replace(col(OriginCol), pattern, nanos.toString))
  }

  /** T5 csv_transform::FromCsv (`sections/csv_transform/src/source.rs:60-174`):
    * binary/string CSV payload → columns, header row defines names, every
    * column Str (reference parses all fields as Str). Operates on a
    * `(origin, value)` frame where `value` holds one CSV document per row.
    * Lines parse through Spark's `from_csv` (RFC-4180 quoting/escapes, like
    * the reference's csv crate), header lines dropped. */
  def fromCsv(header: Seq[String])(df: DataFrame): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(
      header.map(h => org.apache.spark.sql.types.StructField(
        h, org.apache.spark.sql.types.StringType)))
    // Drop ONLY a leading header line (position 0 of its document) — a data
    // row that happens to equal the header string must survive (the
    // reference's csv reader is positional, not content-matching).
    val lines = df.select(col(OriginCol),
      posexplode(split(col("value").cast("string"), "\r?\n")).as(Seq("_pos", "_line")))
      .filter(length(col("_line")) > 0)
      .filter(!(col("_pos") === 0 && col("_line") === lit(header.mkString(","))))
    lines
      .withColumn("_rec", from_csv(col("_line"), schema, Map.empty[String, String]))
      .select(col(OriginCol) +: header.map(h => col(s"_rec.`$h`").as(h)): _*)
  }

  /** T6 csv_transform::ToCsv (`sections/csv_transform/src/destination.rs:17-61`):
    * columns → one CSV line per row in `value`, dates ISO-formatted (ISO is
    * Spark's default string rendering for date/timestamp casts). */
  def toCsv(df: DataFrame): DataFrame = {
    val dataCols = df.columns.filterNot(_ == OriginCol)
    val origin = if (df.columns.contains(OriginCol)) col(OriginCol)
                 else lit("csv").as(OriginCol)
    df.select(origin,
      concat_ws(",", dataCols.map(c => col(c).cast("string")).toIndexedSeq: _*)
        .as("value"))
  }

  /** T7 inspect (`sections/inspect/src/section.rs:10-74`): pass-through
    * debug tap, prints up to 64 rows. */
  def inspect(df: DataFrame): DataFrame = { df.show(64, truncate = false); df }

  /** Inspect, production form: zero-cost pass-through that attaches named
    * metrics (row count, null count of a key column) to the running query
    * via `observe` — readable from QueryExecutionListener / streaming
    * progress without a second scan, unlike show(). */
  def observed(name: String, keyCol: Option[String] = None)(df: DataFrame): DataFrame = {
    val metrics = Seq(count(lit(1)).as("rows")) ++
      keyCol.map(c => sum(when(col(c).isNull, 1).otherwise(0)).as(s"${c}_nulls"))
    df.observe(name, metrics.head, metrics.tail: _*)
  }

  /** Parse the reference's exec `env` config string — comma-separated
    * `K=V` pairs, a bare `K` maps to the empty string
    * (`sections/exec/src/section/mod.rs:16-26`). */
  def parseEnv(s: String): Map[String, String] =
    s.split(',').iterator.map(_.trim).filter(_.nonEmpty).map { pair =>
      pair.split("=", 2) match {
        case Array(k)    => k -> ""
        case Array(k, v) => k -> v
      }
    }.toMap

  // per-executor watchdog for exec timeouts: readAllBytes blocks until the
  // child closes stdout, so the deadline must be enforced by killing the
  // child from the outside, not by waitFor(timeout) after the read
  private lazy val execWatchdog =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, "graft-exec-watchdog"); t.setDaemon(true); t
    }

  /** Spawn `command` with `env`, stream `payload` to stdin from a writer
    * thread (a single-threaded write-then-read deadlocks once both pipe
    * buffers fill), return the child's full stdout. stderr inherits the
    * executor's log stream (the reference line-logs stderr). Nonzero exit
    * or a blown `timeoutMs` deadline fails the task → at-least-once
    * replay. */
  private def runChild(command: Seq[String], env: Map[String, String],
                       timeoutMs: Long, payload: Array[Byte]): Array[Byte] = {
    val pb = new ProcessBuilder(command: _*)
      .redirectError(ProcessBuilder.Redirect.INHERIT)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    val p = pb.start()
    val timedOut = new java.util.concurrent.atomic.AtomicBoolean(false)
    val kill: Option[java.util.concurrent.ScheduledFuture[_]] =
      if (timeoutMs > 0) Some(execWatchdog.schedule(
        new Runnable {
          // only claim a timeout if the kill interrupts a LIVE child — a
          // child that exited 0 just as the deadline fired must not have
          // its successful output discarded by a race with the watchdog
          def run(): Unit =
            if (p.isAlive) { timedOut.set(true); p.destroyForcibly(); () }
        }, timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS))
      else None
    val writer = new Thread(() =>
      // EPIPE when the child exits without draining stdin is the child's
      // business — surfaced via its exit code, not a writer crash
      try { val os = p.getOutputStream; os.write(payload); os.close() }
      catch { case _: java.io.IOException => () })
    writer.setDaemon(true)
    writer.start()
    val out = p.getInputStream.readAllBytes()
    val code = p.waitFor()
    kill.foreach(_.cancel(false))
    writer.join()
    if (timedOut.get) throw new RuntimeException(
      s"exec '${command.mkString(" ")}' timed out after ${timeoutMs} ms")
    if (code != 0) {
      // per-row failures surface on executors — carry a tail of the child's
      // stdout so the failure is attributable from the task error alone
      // (stderr is inherited and lands in the executor log stream)
      val tail = new String(out.takeRight(200),
        java.nio.charset.StandardCharsets.UTF_8)
      throw new RuntimeException(
        s"exec '${command.mkString(" ")}' exited $code" +
        (if (tail.nonEmpty) s"; stdout tail: $tail" else ""))
    }
    out
  }

  /** T8 exec, df mode (`sections/exec/src/section/df.rs:66-127`): the
    * reference runs the command once per row with the row expanded to
    * `--col=val` arguments, then passes the MESSAGE THROUGH unchanged --
    * output frame = input frame; the child's stdout is drained/logged, not
    * emitted. `ack_passthrough` (ack deferred to the downstream section) is
    * Spark's native contract here: a pass-through stage never commits
    * anything; the sink's epoch/write commit is the ack. A nonzero exit
    * fails the task -> at-least-once replay, matching the reference's error
    * path. One process per ROW (reference semantics), rows streamed per
    * partition -- distributed across executors. `env` and `timeoutMs`
    * follow the reference's child-environment config
    * (`sections/exec/src/section/mod.rs:16-26`). */
  def execDf(command: Seq[String], env: Map[String, String] = Map.empty,
             timeoutMs: Long = 0L)(df: DataFrame): DataFrame = {
    val cols = df.columns
    // binary columns must render as a stable text form — Array.toString
    // would pass a JVM identity reference like "[B@1f2a3b" as the arg
    val isBinary: Array[Boolean] =
      df.schema.fields.map(_.dataType == BinaryType)
    def render(v: Any, i: Int): String = v match {
      case null => ""
      case b: Array[Byte] if isBinary(i) => b.map("%02x".format(_)).mkString
      case other => other.toString
    }
    // Dataset.mapPartitions (not df.rdd): keeps the operator usable on
    // STREAMING frames — the ack-passthrough contract is exactly the
    // mid-stream case — and avoids an RDD boundary in batch plans.
    df.mapPartitions { it =>
      it.map { row =>
        val args = command ++ cols.zipWithIndex.map { case (c, i) =>
          s"--$c=${render(row.get(i), i)}"
        }
        runChild(args, env, timeoutMs, Array.emptyByteArray)
        row
      }
    }(org.apache.spark.sql.Encoders.row(df.schema))
  }

  /** T9 exec, bin mode (`sections/exec/src/section/bin.rs:72-166`): one
    * child process PER MESSAGE — the payload bytes stream RAW to the
    * child's stdin and the child's full stdout becomes the output payload,
    * origin preserved. No line framing anywhere: payloads containing
    * newlines or arbitrary bytes (0x00, invalid UTF-8) round-trip exactly,
    * matching the reference's chunk-wise byte pipe. Operates on the
    * canonical binary frame `(origin, value)`; a missing origin column
    * defaults to "exec". Distribution: messages stream per partition, one
    * short-lived process each — across executors this is the scale-out
    * form of the reference's per-daemon child. */
  def execBin(command: Seq[String], env: Map[String, String] = Map.empty,
              timeoutMs: Long = 0L)(df: DataFrame): DataFrame = {
    require(df.columns.contains("value"),
      s"execBin takes the canonical (origin, value) binary frame, got ${df.columns.mkString(",")}")
    val src =
      if (df.columns.contains(OriginCol))
        df.select(col(OriginCol).cast("string"), col("value").cast("binary"))
      else df.select(lit("exec").as(OriginCol), col("value").cast("binary"))
    val schema = StructType(Seq(
      StructField(OriginCol, StringType, nullable = true),
      StructField("value", BinaryType, nullable = true)))
    src.mapPartitions { it =>
      it.map { row =>
        val payload = Option(row.getAs[Array[Byte]](1))
          .getOrElse(Array.emptyByteArray)
        org.apache.spark.sql.Row(
          row.getString(0), runChild(command, env, timeoutMs, payload))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Text-line pipe: payload column cast to string, one line in -> one
    * line out, one process per PARTITION via `rdd.pipe`. This is a
    * line-oriented TEXT transport — embedded newlines split records and
    * non-UTF-8 bytes are not preserved; for raw binary payloads use
    * [[execBin]] (the reference's bin mode). Takes a SINGLE-column frame --
    * multi-column frames have no defined line wire format; use [[execDf]]
    * for row frames. */
  def execPipe(command: Seq[String])(df: DataFrame): DataFrame = {
    require(df.columns.length == 1,
      s"execPipe (text-line mode) takes a single-column frame, got ${df.columns.mkString(",")}; " +
      "use execDf for row frames")
    val spark = df.sparkSession
    import spark.implicits._
    val piped = df.select(col(df.columns.head).cast("string"))
      .as[String].rdd.pipe(command)
    piped.toDF("value")
  }

  /** T10 stub (`sections/stub/src/lib.rs:15-100`): drain input, emit
    * nothing. */
  def stub(df: DataFrame): DataFrame = df.limit(0)

  /** Extension (SURVEY §7.2 step 8): full SQL transform section — the
    * in-pipe equivalent of the reference's pushdown-only query surface.
    * The incoming frame is registered as `input`. */
  def sql(query: String)(df: DataFrame): DataFrame = {
    df.createOrReplaceTempView("input")
    df.sparkSession.sql(query)
  }

  /** Extension: deterministic hash-bucket train/valid/test split column —
    * md5-derived bucket in [0, 100), RNG-free and shuffle-free, stable
    * across runs and engines. Single source of truth for the `ta_split`
    * query and the `dataset_split` section. */
  def splitColumn(id: Column, trainPct: Int = 80, validPct: Int = 10): Column = {
    require(trainPct >= 0 && validPct >= 0 && trainPct + validPct <= 100,
      s"split percentages must be non-negative and sum to <= 100, " +
      s"got train=$trainPct valid=$validPct")
    val bucket = graft.functions.TextFunctions.hash60(id) % 100
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + validPct, "valid")
      .otherwise("test")
  }

  /** Extension: exact deduplication on key columns. With `tieBreak` given,
    * the kept row is DETERMINISTIC — the minimum under the tie-break
    * ordering — via the custom TopKPerKey operator with k=1 (bounded-heap,
    * map-side partial, one shuffle of the survivors). Without it, falls
    * back to `dropDuplicates` (arbitrary survivor, cheapest plan). */
  def dedupExact(keyCols: Seq[String], tieBreak: Seq[String] = Nil)(df: DataFrame): DataFrame =
    if (tieBreak.isEmpty) df.dropDuplicates(keyCols)
    else graft.plans.TopKPerKey(df, keyCols,
      tieBreak.map(graft.plans.TopKPerKey.asc), 1)
}
